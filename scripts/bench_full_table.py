"""Consolidated-baseline harness (round-7 verdict item 4): run the
FULL bench.py surface in R fresh-JVM sessions per parallelism level,
interleaving levels (32, 8, 32, 8, ...) so slow host-contention
drift hits both levels equally (see memory: multi-session medians),
and print one JSON blob with per-query medians + raw samples per
level. BENCH/BASELINE.md's single authoritative table is generated
from this output.

Usage:
    python scripts/bench_full_table.py [-r 3] [--cpus 32 8]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def one_session(cpus: int) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_SF_DIR=os.environ.get(
            "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
        ),
    )
    r = subprocess.run(
        [sys.executable, "bench.py"],
        capture_output=True, text=True, cwd=ROOT, env=env,
    )
    line = next(
        (ln for ln in r.stdout.splitlines()
         if ln.startswith('{"metric"')), None)
    if line is None:
        sys.stderr.write(r.stdout[-2000:] + r.stderr[-4000:])
        raise RuntimeError(f"bench.py produced no JSON at cpus={cpus}")
    return json.loads(line)


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("-r", "--reps", type=int, default=3)
    p.add_argument("--cpus", type=int, nargs="+", default=[32, 8])
    args = p.parse_args()

    samples: dict[int, list[dict]] = {c: [] for c in args.cpus}
    for rep in range(args.reps):
        for c in args.cpus:  # interleaved: 32, 8, 32, 8, ...
            got = one_session(c)
            samples[c].append(got)
            print(
                f"session rep={rep + 1}/{args.reps} cpus={c}: "
                f"total={got['value']} clips/s={got['clips_per_sec']}",
                flush=True,
            )

    out: dict = {"sf_dir": os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"), "levels": {}}
    for c, runs in samples.items():
        queries = sorted(runs[0]["queries"])
        med = {
            q: round(statistics.median(r["queries"][q] for r in runs), 3)
            for q in queries
        }
        out["levels"][str(c)] = {
            "medians": med,
            "median_total": round(
                statistics.median(r["value"] for r in runs), 3),
            "median_clips_per_sec": round(
                statistics.median(r["clips_per_sec"] for r in runs), 1),
            "totals": [r["value"] for r in runs],
            "clips_per_sec": [r["clips_per_sec"] for r in runs],
            "raw_queries": {
                q: [r["queries"][q] for r in runs] for q in queries
            },
        }
    print("BENCH_FULL_TABLE " + json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
