"""Per-query fresh-JVM median harness (BENCH/BASELINE.md protocol).

Runs each named driver query in R separate fresh-JVM sessions at
local[$SPARK_GRAFT_CPUS] against $SPARK_GRAFT_SF_DIR, timing the same
noop-sink materialization bench.py uses, and prints per-session
samples plus the median. Sessions are whole-JVM so no exchange/cache
reuse can leak between samples (see memory: multi-session medians).

Usage:
    python scripts/bench_medians.py [-r 3] query [query ...]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys

CHILD = r"""
import json, os, sys, time

sf_dir = os.environ["SPARK_GRAFT_SF_DIR"]
cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
names = sys.argv[1:]

from ungoliant_spark.session import get_spark

spark = get_spark("bench-medians", master=f"local[{cpus}]",
                  shuffle_partitions=2 * cpus)
import __spark_entry__ as entrymod
from pyspark.sql import functions as F

# same untimed warmup as bench.py (class-loading + codegen JIT)
warm = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(256)
warm.select(
    F.length(F.regexp_replace("text", r"[\p{L}\p{M}]", ""))
).write.format("noop").mode("overwrite").save()

qs = entrymod.queries()
out = {}
for name in names:
    t0 = time.time()
    qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
    out[name] = round(time.time() - t0, 3)
    from ungoliant_spark.operators.dedup import unpersist_group_tables
    unpersist_group_tables()
print("BENCH_MEDIANS_RESULT " + json.dumps(out))
spark.stop()
"""


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("-r", "--reps", type=int, default=3)
    p.add_argument("queries", nargs="+")
    args = p.parse_args()

    os.environ.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    samples: dict[str, list[float]] = {q: [] for q in args.queries}
    for rep in range(args.reps):
        r = subprocess.run(
            [sys.executable, "-c", CHILD, *args.queries],
            capture_output=True, text=True,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        line = next(
            (ln for ln in r.stdout.splitlines()
             if ln.startswith("BENCH_MEDIANS_RESULT ")), None)
        if line is None:
            sys.stderr.write(r.stdout[-2000:] + r.stderr[-4000:])
            return 1
        got = json.loads(line.split(" ", 1)[1])
        for q, s in got.items():
            samples[q].append(s)
        print(f"session {rep + 1}/{args.reps}: {got}", flush=True)
    print(json.dumps({
        "medians": {q: statistics.median(v) for q, v in samples.items()},
        "samples": samples,
        "cpus": os.environ.get("SPARK_GRAFT_CPUS", "32"),
        "sf_dir": os.environ["SPARK_GRAFT_SF_DIR"],
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
