"""Corpus-curation operators — the selection passes an LLM-training
data team runs AFTER quality filtering and dedup: deterministic
stratified sampling, per-stratum token-budget packing, and
per-stratum top-k. The reference stops at per-lang grouped writes
(/root/reference/src/pipelines/oscardoc/pipeline.rs:313-326); these
are the downstream curation steps specified fresh here, Spark-first.

All selection is DETERMINISTIC (hash- or order-based, never rng) so
re-runs, resumes and audits reproduce the same corpus, and every
operator is oracle-checkable in DuckDB.

Scale design — the budget packer is the interesting one. "Keep the
highest-priority rows per stratum until the token budget fills" needs
a per-stratum prefix sum over a total order, and the naive Spark form
(`sum over (partition by stratum order by ...)`) sorts an entire
stratum in ONE task — a 0.7·10^12-row straggler on a 70%-en crawl.
Instead this module computes a DISTRIBUTED prefix sum:

1. range-partition by the full sort key (stratum, priority desc, id)
   and sort within partitions — Spark's range partitioner keeps every
   stratum's rows ordered ACROSS partitions;
2. one tiny aggregate of per-(stratum, partition) weight sums to the
   driver (#strata × #partitions rows — the same "small table to the
   driver" shape as the IVF centroid sample);
3. broadcast the per-partition offsets back and window-cumsum WITHIN
   each partition only.

Every task sorts ~1/n_partitions of the data regardless of stratum
skew, and the driver hash-check against DuckDB's naive global-window
twin proves the distributed form computes the identical prefix sums.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ungoliant_spark.functions import textstats as ts
from ungoliant_spark.operators.dedup import hash64

SAMPLE_DENOM = 1_000_000

# hard bound on the prefix-sum driver-side offset table
# (#strata × n_partitions rows); see prefix_sums
MAX_OFFSET_ROWS = 1_000_000


def sample_cutoff(rate: float) -> int:
    """The integer ticket cutoff for a sampling rate: round-half-away
    of ``rate · 10^6``, computed ONCE in Python and injected as a
    literal into both the Spark filter and the DuckDB oracle
    (oracle_sql_dataset.oracle_curation_sample). A float expression
    cast engine-side is a latent off-by-one: Spark's cast(long)
    truncates while DuckDB's CAST rounds, so a rate like 0.3
    (binary 299999.99999999994 after scaling) would keep ticket
    299999 in one engine and not the other."""
    return int(rate * SAMPLE_DENOM + 0.5)


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    id_col: str = "doc_id",
    strata_col: str = "source",
    default_rate: float = 0.0,
    salt: str = "sample-v1",
) -> DataFrame:
    """Deterministic per-stratum sampling: keep a row iff
    ``hash64(salt || id) % 10^6 < sample_cutoff(rate(stratum))``.
    Unlike ``df.sample``/``sampleBy`` (rng-seeded per partition,
    resample on retry/re-partitioning), the decision is a pure
    function of the row id — stable under resume, re-partitioning and
    audit, and the same id keeps/drops consistently across runs with
    the same salt (change the salt to draw an independent sample).
    Cutoffs are precomputed integers (:func:`sample_cutoff`), never a
    float cast in the plan. Pure Catalyst; one projection + filter,
    no shuffle."""
    for s, r in rates.items():
        if not (0.0 <= r <= 1.0):
            raise ValueError(f"rate for stratum {s!r} must be in [0,1]: {r}")
    if not (0.0 <= default_rate <= 1.0):
        raise ValueError(f"default_rate must be in [0,1]: {default_rate}")
    cutoff: Column = F.lit(sample_cutoff(default_rate))
    for s, r in rates.items():
        cutoff = F.when(
            F.col(strata_col) == s, F.lit(sample_cutoff(r))
        ).otherwise(cutoff)
    ticket = hash64(
        F.concat(F.lit(salt), F.lit(":"), F.col(id_col).cast("string"))
    ) % SAMPLE_DENOM
    return df.withColumn("sample_ticket", ticket).filter(
        F.col("sample_ticket") < cutoff
    )


def prefix_sums(
    df: DataFrame,
    weight: Column,
    priority: Column,
    id_col: str = "doc_id",
    strata_col: str = "source",
    n_partitions: int = 32,
) -> DataFrame:
    """(id, stratum, weight, priority, cum_weight) for EVERY row: the
    per-stratum running weight total in (priority desc, id asc)
    order, computed as a DISTRIBUTED prefix sum (module docstring) —
    the shared engine under :func:`budget_pack` and
    :func:`pack_sequences`.

    NOT a lazy plan: calling this runs Spark jobs immediately (the
    range partitioning's boundary sampling, a localCheckpoint of the
    partitioned table, and the per-(stratum, partition) offset
    aggregate to the driver) — it is a multi-pass algorithm, like
    near_dup_components' iteration loop, not a deferred expression.
    The checkpoint is REQUIRED for correctness, not just speed:
    repartitionByRange samples boundaries with a nondeterministic
    seed, so the partition-id column must be pinned before the
    offset aggregate and the final window both consume it —
    recomputation could re-draw boundaries and mismatch the offsets.

    The driver-side offset table is #strata × n_partitions rows, so
    a high-cardinality ``strata_col`` (say URL domain on a crawl)
    would collect millions of rows to the driver; the strata count is
    checked FIRST (one tiny column-pruned aggregate) and the call
    raises if ``#strata × n_partitions > MAX_OFFSET_ROWS`` — pick a
    coarser stratum or pre-aggregate. NULL weights (e.g. null text →
    null token count) coalesce to 0 so the running sums stay defined.
    """
    # the string cast is ONLY the internal driver offset key (dict keys
    # + createDataFrame schema below); the original-typed column rides
    # along and is what the caller gets back, so non-string strata
    # (int buckets, dates) keep their type through budget_pack /
    # pack_sequences (ADVICE r6)
    base = df.select(
        F.col(id_col).alias("id"),
        F.col(strata_col).cast("string").alias("stratum"),
        F.col(strata_col).alias("stratum_orig"),
        F.coalesce(weight.cast("long"), F.lit(0)).alias("weight"),
        priority.alias("priority"),
    )
    n_strata = base.agg(
        F.count_distinct("stratum").alias("n")
    ).collect()[0]["n"]
    if n_strata * n_partitions > MAX_OFFSET_ROWS:
        raise ValueError(
            f"prefix_sums: {n_strata} distinct strata × {n_partitions} "
            f"partitions = {n_strata * n_partitions} driver-side offset "
            f"rows exceeds MAX_OFFSET_ROWS={MAX_OFFSET_ROWS}; use a "
            "coarser strata_col (language-like cardinality) or shard "
            "the input by stratum ranges before packing"
        )
    ranged = (
        base.repartitionByRange(
            n_partitions,
            F.col("stratum"),
            F.col("priority").desc(),
            F.col("id"),
        )
        .sortWithinPartitions(
            F.col("stratum"), F.col("priority").desc(), F.col("id")
        )
        .withColumn("pid", F.spark_partition_id())
        .localCheckpoint()
    )
    part_sums = (
        ranged.groupBy("stratum", "pid")
        .agg(F.sum("weight").alias("w"))
        .collect()
    )
    offsets: dict[tuple, int] = {}
    running: dict[str, int] = {}
    for row in sorted(part_sums, key=lambda r: (str(r["stratum"]), r["pid"])):
        key = row["stratum"]
        offsets[(key, row["pid"])] = running.get(key, 0)
        running[key] = running.get(key, 0) + row["w"]
    spark = df.sparkSession
    off_df = spark.createDataFrame(
        [(s, p, o) for (s, p), o in offsets.items()],
        "stratum string, pid int, offset long",
    )
    w = Window.partitionBy("stratum", "pid").orderBy(
        F.desc("priority"), F.asc("id")
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        ranged.join(F.broadcast(off_df), ["stratum", "pid"])
        .withColumn(
            "cum_weight", F.col("offset") + F.sum("weight").over(w)
        )
        .select(
            F.col("id").alias(id_col),
            F.col("stratum_orig").alias(strata_col),
            "weight",
            "priority",
            "cum_weight",
        )
    )


def budget_pack(
    df: DataFrame,
    budget: int,
    weight: Column,
    priority: Column,
    id_col: str = "doc_id",
    strata_col: str = "source",
    n_partitions: int = 32,
) -> DataFrame:
    """Per-stratum greedy selection under a weight budget: keep, in
    (priority desc, id asc) order within each stratum, every row
    whose cumulative weight stays ≤ ``budget`` — a filter over
    :func:`prefix_sums` (whose eager multi-pass caveat applies)."""
    return prefix_sums(
        df, weight, priority, id_col, strata_col, n_partitions
    ).filter(F.col("cum_weight") <= budget)


def pack_sequences(
    df: DataFrame,
    seq_len: int,
    id_col: str = "doc_id",
    strata_col: str = "source",
    text_col: str = "text",
    n_partitions: int = 32,
) -> DataFrame:
    """Document → training-sequence assignment (the pretraining prep
    step): per stratum, lay documents end-to-end in (quality desc,
    id) order and cut every ``seq_len`` tokens — doc d belongs to
    sequence ``floor(start_offset / seq_len)``, where start_offset
    is the running token count BEFORE d. Returns (id, stratum,
    weight, priority, cum_weight, seq_id, seq_offset): ``seq_offset``
    is the doc's start position inside its sequence, so a writer can
    materialize fixed-length rows downstream. Deterministic, no rng;
    built on the same distributed prefix sum (eager multi-pass
    caveat in :func:`prefix_sums` applies). A doc longer than
    seq_len simply spans sequences — the assignment records where it
    STARTS, matching concat-then-chunk packing semantics."""
    if seq_len < 1:
        raise ValueError(f"seq_len must be >= 1, got {seq_len}")
    t = F.col(text_col)
    sums = prefix_sums(
        df,
        weight=ts.token_count(t),
        priority=ts.quality_score(t),
        id_col=id_col,
        strata_col=strata_col,
        n_partitions=n_partitions,
    )
    start = F.col("cum_weight") - F.col("weight")
    return sums.select(
        id_col,
        strata_col,
        "weight",
        "priority",
        "cum_weight",
        F.floor(start / seq_len).cast("long").alias("seq_id"),
        F.pmod(start, F.lit(seq_len)).cast("long").alias("seq_offset"),
    )


def token_budget_pack(
    df: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    strata_col: str = "source",
    text_col: str = "text",
    n_partitions: int = 32,
) -> DataFrame:
    """Keep the highest-quality rows per stratum until the TOKEN
    budget fills — :func:`budget_pack` with weight = token count and
    priority = the frozen quality score (6-dp rounded in both engines,
    ties broken by id)."""
    t = F.col(text_col)
    return budget_pack(
        df,
        budget,
        weight=ts.token_count(t),
        priority=ts.quality_score(t),
        id_col=id_col,
        strata_col=strata_col,
        n_partitions=n_partitions,
    )


def stratified_topk(
    df: DataFrame,
    k: int,
    id_col: str = "doc_id",
    strata_col: str = "source",
    text_col: str = "text",
    n_partitions: int = 32,
) -> DataFrame:
    """Top-k rows per stratum by quality — :func:`budget_pack` with
    unit weights (cum_weight becomes the per-stratum rank), so the
    same distributed prefix sum bounds every task at ~1/n_partitions
    of the data instead of sorting a whole stratum in one task."""
    return budget_pack(
        df,
        k,
        weight=F.lit(1),
        priority=ts.quality_score(F.col(text_col)),
        id_col=id_col,
        strata_col=strata_col,
        n_partitions=n_partitions,
    )
