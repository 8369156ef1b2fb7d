"""Train the deterministic fixture LID model and write
ungoliant_spark/resources/lid_model.npz (committed; see lid_model.py)."""
import sys, time

sys.path.insert(0, ".")
from ungoliant_spark.lid_model import DEFAULT_MODEL_PATH, train

if __name__ == "__main__":
    t0 = time.time()
    model = train()
    model.save(DEFAULT_MODEL_PATH)
    print(f"saved {DEFAULT_MODEL_PATH} in {time.time()-t0:.1f}s")
