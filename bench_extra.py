"""Extra benchmarks for the optimization round (guide §1.4): isolate
individual declared queries through the noop sink, repeat them for
medians, dump .explain("formatted") plans, and probe the internals of
the components family (per-round propagation wall, round counts).

bench.py is FROZEN for driver measurement — this file is where all
ad-hoc numbers cited in OPTIMIZATION_r08.md come from.

Usage:
  python bench_extra.py queries dedup_components audio_dup_pairs --reps 3
  python bench_extra.py explain dedup_components --tag before
  python bench_extra.py components-probe
  python bench_extra.py decode-probe
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import time

os.environ.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _spark():
    from ungoliant_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    return get_spark(
        "ungoliant-bench-extra",
        master=f"local[{cpus}]",
        shuffle_partitions=2 * cpus,
    )


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def cmd_queries(args) -> None:
    sf_dir = os.environ["SPARK_GRAFT_SF_DIR"]
    spark = _spark()
    import __spark_entry__ as entrymod

    from ungoliant_spark.operators.dedup import unpersist_group_tables

    qs = entrymod.queries()
    out: dict[str, dict] = {}
    for name in args.names:
        samples = []
        for _ in range(args.reps):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            _noop(qs[name](spark, sf_dir))
            samples.append(round(time.time() - t0, 3))
            unpersist_group_tables()
        out[name] = {
            "samples": samples,
            "median": round(statistics.median(samples), 3),
        }
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps({"bench_extra": out}))
    spark.stop()


def cmd_explain(args) -> None:
    sf_dir = os.environ["SPARK_GRAFT_SF_DIR"]
    spark = _spark()
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    os.makedirs(args.out_dir, exist_ok=True)
    for name in args.names:
        df = qs[name](spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(args.out_dir, f"{name}_{args.tag}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"wrote {path} ({len(txt)} chars)")
    spark.stop()


def cmd_components_probe(args) -> None:
    """Phase-timed run of dedup_components: simhash table, pair edges,
    then the propagation loop with per-round wall (monkeypatched
    timer around near_dup_components' step materialization)."""
    sf_dir = os.environ["SPARK_GRAFT_SF_DIR"]
    spark = _spark()
    from pyspark.sql import functions as F

    from ungoliant_spark.operators import dedup as dd

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    t0 = time.time()
    sh = dd.simhash63_table(docs)
    _noop(sh)
    print(f"simhash63_table: {time.time()-t0:.2f}s", flush=True)

    t0 = time.time()
    pairs = dd.simhash_pairs(docs)
    _noop(pairs)
    n_pairs = pairs.count()
    print(
        f"simhash_pairs (noop+count, n={n_pairs}): {time.time()-t0:.2f}s",
        flush=True,
    )
    dd.unpersist_group_tables()

    # full components with a per-round probe: wrap localCheckpoint
    # timing by re-running the loop inline (same code path as
    # near_dup_components, duplicated here for instrumentation only)
    t0 = time.time()
    pairs = dd.simhash_pairs(docs)
    edges = pairs.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    ).persist()
    touched = (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    labels = touched.withColumn("label", F.col("id")).localCheckpoint()
    print(f"edges+touched+labels ckpt: {time.time()-t0:.2f}s", flush=True)
    n_nodes = labels.count()
    print(f"touched nodes: {n_nodes}", flush=True)

    both = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    rounds = 0
    while True:
        t0 = time.time()
        msgs = (
            both.join(labels, both.src == labels.id)
            .groupBy("dst")
            .agg(F.min("label").alias("nbr_label"))
        )
        prop = labels.join(msgs, labels.id == msgs.dst, "left").select(
            "id",
            F.col("label").alias("prev"),
            F.least(
                F.col("label"), F.coalesce("nbr_label", F.col("label"))
            ).alias("label"),
        )
        l2 = prop.select(
            F.col("id").alias("id2"), F.col("label").alias("label2")
        )
        stepped = prop.join(l2, prop.label == F.col("id2"), "left").select(
            "id", "prev", F.coalesce("label2", "label").alias("label")
        ).localCheckpoint()
        t1 = time.time()
        converged = stepped.filter(F.col("label") != F.col("prev")).isEmpty()
        t2 = time.time()
        labels = stepped.drop("prev")
        rounds += 1
        print(
            f"round {rounds}: step+ckpt {t1-t0:.2f}s, isEmpty {t2-t1:.2f}s",
            flush=True,
        )
        if converged:
            break
    t0 = time.time()
    out = (
        docs.select("doc_id")
        .join(labels.withColumnRenamed("id", "doc_id"), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("label", F.col("doc_id")).alias("component_rep"),
        )
    )
    _noop(out)
    print(f"final fill-in join + noop: {time.time()-t0:.2f}s", flush=True)
    edges.unpersist()
    dd.unpersist_group_tables()
    spark.stop()


def cmd_decode_probe(args) -> None:
    """Isolate the audio decode pass vs the dedup machinery above it."""
    sf_dir = os.environ["SPARK_GRAFT_SF_DIR"]
    spark = _spark()
    from pyspark.sql import functions as F

    from ungoliant_spark.operators import audio_ops as ao
    from ungoliant_spark.plans.clips_queries import load_clips

    clips = load_clips(spark, sf_dir)

    t0 = time.time()
    fp = ao.audio_stats(clips).select("clip_id", "afp")
    _noop(fp)
    print(f"decode->(clip_id, afp) noop: {time.time()-t0:.2f}s", flush=True)

    t0 = time.time()
    fp = (
        ao.audio_stats(clips)
        .filter(F.col("decode_ok") & F.col("afp").isNotNull())
        .select("clip_id", "afp")
    )
    groups = fp.groupBy("afp").agg(
        F.min("clip_id").alias("rep"),
        F.collect_list("clip_id").alias("ids"),
    )
    n = groups.count()
    print(f"decode->groups count ({n} groups): {time.time()-t0:.2f}s",
          flush=True)

    t0 = time.time()
    _noop(ao.audio_dup_pairs(clips))
    from ungoliant_spark.operators.dedup import unpersist_group_tables

    unpersist_group_tables()
    print(f"audio_dup_pairs full: {time.time()-t0:.2f}s", flush=True)
    spark.stop()


def main() -> None:
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="cmd", required=True)
    q = sub.add_parser("queries")
    q.add_argument("names", nargs="+")
    q.add_argument("--reps", type=int, default=3)
    q.set_defaults(fn=cmd_queries)
    e = sub.add_parser("explain")
    e.add_argument("names", nargs="+")
    e.add_argument("--tag", default="before")
    e.add_argument("--out-dir", default="plans/r08")
    e.set_defaults(fn=cmd_explain)
    c = sub.add_parser("components-probe")
    c.set_defaults(fn=cmd_components_probe)
    d = sub.add_parser("decode-probe")
    d.set_defaults(fn=cmd_decode_probe)
    args = p.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()
