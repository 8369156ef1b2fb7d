"""Two-parallelism scaling evidence (north_rule): run the identical
bench workload at local[8] (N) and local[32] (4N) on the same input
and report throughput + scaling efficiency into BENCH/BASELINE.md.

No real cluster exists in this sandbox (SURVEY.md §4), so executor
fan-out is evidenced by core fan-out in one JVM; each run is a fresh
subprocess so JVM/page-cache state doesn't leak between levels.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from datetime import datetime, timezone

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bench(cpus: int, sf_dir: str) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_CPUS"] = str(cpus)
    env["SPARK_GRAFT_SF_DIR"] = sf_dir
    # two reps, min taken: separates steady-state throughput from
    # one-time session warmup (python workers, codegen, page cache)
    env.setdefault("BENCH_REPS", "2")
    out = subprocess.run(
        [sys.executable, "bench.py"],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        check=True,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    lo, hi = 8, 32
    r_lo = run_bench(lo, sf_dir)
    r_hi = run_bench(hi, sf_dir)
    rate_lo = r_lo["clips_per_sec"]
    rate_hi = r_hi["clips_per_sec"]
    eff = (rate_hi / rate_lo) / (hi / lo)
    report = {
        "sf": r_lo["sf"],
        "clips": r_lo["clips"],
        "n_cores": lo,
        "4n_cores": hi,
        "clips_per_sec_n": rate_lo,
        "clips_per_sec_4n": rate_hi,
        "scaling_efficiency": round(eff, 3),
        "headline_sec_n": r_lo["value"],
        "headline_sec_4n": r_hi["value"],
        "queries_n": r_lo["queries"],
        "queries_4n": r_hi["queries"],
    }
    print(json.dumps(report))
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    path = os.path.join(REPO, "BENCH", "BASELINE.md")
    stamp = datetime.now(timezone.utc).strftime("%Y-%m-%d %H:%M UTC")
    with open(path, "w") as f:
        f.write(
            f"""# BENCH/BASELINE — measured numbers ({stamp})

Scaling evidence for the north_rule two-cluster-size criterion,
measured as local[{lo}] (N) vs local[{hi}] (4N) on identical input
(no real cluster in this sandbox; fresh JVM per level).

| metric | value |
|---|---|
| input | clips fixture sf={report['sf']} ({report['clips']} clips) + documents sf tables |
| clips/sec @ N={lo} cores | {rate_lo} |
| clips/sec @ 4N={hi} cores | {rate_hi} |
| **scaling efficiency N→4N** | **{report['scaling_efficiency']}** (target ≥ 0.8) |
| headline total @ N | {r_lo['value']} s |
| headline total @ 4N | {r_hi['value']} s |

Per-query seconds:

| query | N={lo} | 4N={hi} |
|---|---|---|
"""
            + "\n".join(
                f"| {k} | {r_lo['queries'][k]} | {r_hi['queries'][k]} |"
                for k in r_lo["queries"]
            )
            + "\n"
        )
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
