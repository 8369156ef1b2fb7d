"""Curation operators: deterministic stratified sampling and the
distributed prefix-sum budget packer (operators/curation.py). The
load-bearing scale property: a single giant stratum is SPLIT across
range partitions (every task bounded at ~1/n_partitions) while the
selection still equals the naive global-window form."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from ungoliant_spark.operators import curation as cur

SF = "/root/testdata/sf0.01"


def test_stratified_sample_deterministic_and_rate(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    rates = {"src0": 0.5, "src1": 1.0, "src2": 0.0}
    got = cur.stratified_sample(docs, rates, default_rate=0.25)
    pdf = got.select("doc_id", "source").toPandas()
    by_src = pdf.groupby("source").size()
    assert by_src.get("src1") == 25  # rate 1.0 keeps everything
    assert "src2" not in by_src.index  # rate 0.0 keeps nothing
    # determinism: same ids regardless of partitioning
    again = cur.stratified_sample(
        docs.repartition(13), rates, default_rate=0.25
    ).select("doc_id").toPandas()
    assert sorted(again.doc_id) == sorted(pdf.doc_id)
    # a different salt draws a different (but still deterministic) set
    other = cur.stratified_sample(
        docs, rates, default_rate=0.25, salt="sample-v2"
    ).select("doc_id").toPandas()
    assert sorted(other.doc_id) != sorted(pdf.doc_id)


def test_stratified_sample_rejects_bad_rate(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    with pytest.raises(ValueError, match="rate"):
        cur.stratified_sample(docs, {"src0": 1.5})
    with pytest.raises(ValueError, match="default_rate"):
        cur.stratified_sample(docs, {}, default_rate=-0.1)


def _naive_pack(df, budget, weight, priority):
    """The straggler-prone global-window form — test twin only."""
    w = Window.partitionBy("stratum").orderBy(
        F.desc("priority"), F.asc("id")
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        df.select(
            F.col("doc_id").alias("id"),
            F.col("source").alias("stratum"),
            weight.cast("long").alias("weight"),
            priority.alias("priority"),
        )
        .withColumn("cum_weight", F.sum("weight").over(w))
        .filter(F.col("cum_weight") <= budget)
    )


def test_budget_pack_equals_naive_window(spark):
    """On the fixture (20 strata), the distributed prefix sum selects
    exactly the rows of the naive per-stratum global window."""
    from ungoliant_spark.functions import textstats as ts

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    t = F.col("text")
    got = cur.token_budget_pack(docs, 600).toPandas()
    exp = _naive_pack(
        docs, 600, ts.token_count(t), ts.quality_score(t)
    ).toPandas()
    key = lambda d: sorted(
        map(tuple, d[["id", "weight", "cum_weight"]].values.tolist())
    ) if "id" in d else sorted(
        map(tuple, d[["doc_id", "weight", "cum_weight"]].values.tolist())
    )
    assert key(got.rename(columns={"doc_id": "id"})) == key(exp)


def test_budget_pack_splits_giant_stratum(spark):
    """ONE stratum with 50k rows, 8 range partitions: every partition
    holds a bounded share (the naive stratum-partitioned window would
    put all 50k in one task), and the selection is still the exact
    greedy prefix: ids in priority order until the budget fills."""
    n, parts, budget = 50_000, 8, 12_345
    df = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.lit("en").alias("source"),
        F.lit("x").alias("text"),
    )
    # priority = scrambled id (deterministic, distinct); weight = 1+id%7
    priority = F.pmod(F.col("doc_id") * 2654435761, F.lit(99991)).cast(
        "double"
    )
    weight = (F.col("doc_id") % 7 + 1)
    got = cur.budget_pack(
        df, budget, weight=weight, priority=priority,
        strata_col="source", n_partitions=parts,
    )
    pdf = got.toPandas().sort_values("cum_weight")
    # exact greedy reference computed locally
    rows = sorted(
        ((((i * 2654435761) % 99991), i) for i in range(n)),
        key=lambda p: (-p[0], p[1]),
    )
    cum, exp_ids = 0, []
    for pri, i in rows:
        w = i % 7 + 1
        if cum + w > budget:
            break
        cum += w
        exp_ids.append(i)
    assert list(pdf.doc_id) == exp_ids
    assert int(pdf.cum_weight.iloc[-1]) == cum <= budget
    # the giant stratum really was split: selected rows span several
    # range partitions (each bounded ~n/parts)
    base = df.select(
        F.col("doc_id").alias("id"), F.col("source").alias("stratum"),
        weight.cast("long").alias("weight"), priority.alias("priority"),
    )
    ranged = base.repartitionByRange(
        parts, F.col("stratum"), F.col("priority").desc(), F.col("id")
    )
    counts = [
        r["count"]
        for r in ranged.groupBy(F.spark_partition_id()).count().collect()
    ]
    assert len(counts) >= parts - 1  # stratum spread over partitions
    assert max(counts) < n / 2  # no task holds the whole stratum


def test_stratified_topk_rank_semantics(spark):
    """Unit weights: cum_weight is the per-stratum rank; exactly k
    rows per stratum (fixture strata all have >= k rows)."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    got = cur.stratified_topk(docs, 10).toPandas()
    sizes = got.groupby("source").size()
    assert (sizes == 10).all()
    assert set(got.cum_weight) == set(range(1, 11))


def test_pack_sequences_layout(spark):
    """Concat-then-chunk semantics: within each stratum (priority
    desc, id) order, each doc's start offset is the previous cum;
    seq_id = start // seq_len, seq_offset = start % seq_len; the
    total token count per stratum spans ceil(total/seq_len)
    sequences with no gaps."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    got = cur.pack_sequences(docs, 128).toPandas()
    assert (got.seq_offset < 128).all() and (got.seq_offset >= 0).all()
    for src, grp in got.groupby("source"):
        g = grp.sort_values("cum_weight")
        starts = g.cum_weight - g.weight
        # contiguous layout: starts are the shifted cumulative sums
        assert list(starts) == [0] + list(g.cum_weight)[:-1]
        assert (g.seq_id == starts // 128).all()
        total = g.weight.sum()
        assert g.seq_id.max() == (total - g.weight.iloc[-1]) // 128
        # with every doc shorter than seq_len (true on this fixture),
        # no sequence index can be skipped: each is occupied by a start
        assert (g.weight < 128).all()
        assert set(g.seq_id) == set(range(0, int(g.seq_id.max()) + 1))
    with pytest.raises(ValueError, match="seq_len"):
        cur.pack_sequences(docs, 0)


def test_sample_cutoff_is_exact_integer(spark):
    """ADVICE r5: rates not exactly representable in binary (0.3
    scales to 299999.99999999994) must map to the intended integer
    cutoff in BOTH engines — the cutoff is precomputed in Python, so
    the boundary ticket 299999 is kept, never truncated away."""
    assert cur.sample_cutoff(0.3) == 300_000
    assert cur.sample_cutoff(0.0) == 0
    assert cur.sample_cutoff(1.0) == cur.SAMPLE_DENOM
    docs = spark.range(20_000).select(
        F.col("id").alias("doc_id"), F.lit("s").alias("source")
    )
    got = cur.stratified_sample(docs, {"s": 0.3})
    # every kept ticket is strictly below the rounded cutoff, and the
    # keep-rate lands near 0.3 (hash uniformity)
    mx = got.agg(F.max("sample_ticket").alias("m")).collect()[0]["m"]
    assert mx < 300_000
    n = got.count()
    assert 0.25 * 20_000 < n < 0.35 * 20_000


def test_prefix_sums_null_weight_and_strata_guard(spark):
    """ADVICE r5: NULL weights (null text -> null token count)
    coalesce to 0 instead of raising in the driver offset loop; a
    high-cardinality strata column fails loudly BEFORE collecting an
    unbounded offset table."""
    df = spark.range(100).select(
        F.col("id").alias("doc_id"),
        F.lit("s").alias("source"),
        F.when(F.col("id") % 3 == 0, F.lit(None).cast("long"))
        .otherwise(F.lit(2))
        .alias("w"),
    )
    out = cur.prefix_sums(
        df, weight=F.col("w"), priority=F.col("doc_id").cast("double"),
        n_partitions=4,
    ).toPandas()
    assert len(out) == 100
    # nulls contribute 0: total = 2 * (#non-null rows)
    n_nonnull = 100 - len([i for i in range(100) if i % 3 == 0])
    assert out.cum_weight.max() == 2 * n_nonnull
    assert (out.weight >= 0).all()
    # guard: doc_id as stratum -> 100 strata; tiny MAX_OFFSET_ROWS
    # via a huge n_partitions is impractical, so monkey the bound
    import ungoliant_spark.operators.curation as cmod

    old = cmod.MAX_OFFSET_ROWS
    cmod.MAX_OFFSET_ROWS = 50
    try:
        with pytest.raises(ValueError, match="MAX_OFFSET_ROWS"):
            cur.prefix_sums(
                df,
                weight=F.col("w"),
                priority=F.col("doc_id").cast("double"),
                strata_col="doc_id",
                n_partitions=4,
            )
    finally:
        cmod.MAX_OFFSET_ROWS = old


def test_prefix_sums_preserves_strata_type(spark):
    """ADVICE r6: the string cast inside prefix_sums is ONLY the
    internal driver offset key — an int-typed strata column must come
    back int-typed with its original values (and propagate that way
    through budget_pack), not silently stringified."""
    df = spark.range(60).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 3).cast("int").alias("bucket"),
        F.lit(2).alias("w"),
    )
    out = cur.prefix_sums(
        df,
        weight=F.col("w"),
        priority=F.col("doc_id").cast("double"),
        strata_col="bucket",
        n_partitions=4,
    )
    assert dict(out.dtypes)["bucket"] == "int"
    pdf = out.toPandas()
    assert sorted(pdf.bucket.unique()) == [0, 1, 2]
    # per-stratum running totals are unchanged by the type fix
    assert pdf.groupby("bucket").cum_weight.max().eq(40).all()
    packed = cur.budget_pack(
        df,
        budget=10,
        weight=F.col("w"),
        priority=F.col("doc_id").cast("double"),
        strata_col="bucket",
        n_partitions=4,
    )
    assert dict(packed.dtypes)["bucket"] == "int"
    assert packed.count() == 15  # 5 docs of weight 2 per stratum


def test_prefix_sum_window_is_partition_scoped(spark):
    """Plan gate: the prefix-sum window runs per (stratum, pid) — the
    range-partition slice — never per whole stratum, so no task ever
    sorts a full stratum."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = cur.token_budget_pack(docs, 600)._jdf.queryExecution()\
        .executedPlan().toString()
    import re

    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs, plan
    for spec in specs:
        assert "pid" in spec, (spec, plan)
