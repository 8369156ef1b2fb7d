"""Bucketed (co-partitioned) storage for shuffle-free rebuild joins.

The rebuild path (plans/checkpoint.py::rebuild — the reference's
Rebuilder, src/processing/rebuild.rs:234-305) joins the lineage table
against the source clips table on the record id. At 10¹² clips both
sides are corpus-sized, so a plain join shuffles the ENTIRE source
corpus on the join key — the single biggest avoidable data movement
in the rebuild job. Bucketing both tables on the key at write time
(`bucketBy(n, key).sortBy(key)`) pins rows to hash buckets on disk,
and Spark's bucketed-scan planning then executes the join with ZERO
Exchange on either side (sort-merge over co-located buckets) — the
reference's analog is that a shard's records and its rebuild metadata
live in the same Avro file, so rebuilding never re-shuffles shards.

Bucketed tables need a catalog (`saveAsTable`); the snapshot-manifest
layer stays the default sink, with this as the opt-in layout for
rebuild-heavy deployments. Size `n_buckets` so one bucket of the
clips table fits an executor's scan budget (e.g. 100 TB / 200 MB ≈
500k buckets is too many files; in practice thousands of buckets ×
table-partition pruning).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame, table: str, key: str, n_buckets: int
) -> None:
    """Persist ``df`` bucketed+sorted by ``key`` (parquet, catalog
    table). Both sides of a future key-equi-join must use the SAME
    n_buckets for the shuffle-free plan."""
    (
        df.write.bucketBy(n_buckets, key)
        .sortBy(key)
        .mode("overwrite")
        .format("parquet")
        .saveAsTable(table)
    )


def rebuild_bucketed(
    spark: SparkSession,
    lineage_table: str,
    clips_table: str,
    lang: str | None = None,
) -> DataFrame:
    """The lineage⋈clips rebuild join over co-bucketed tables: same
    result as plans.checkpoint.rebuild, but the physical plan contains
    no Exchange — each task reads bucket i of both tables and merges.
    Plan-gated by tests/test_plan_quality.py."""
    from ungoliant_spark.functions.lines import rust_lines

    lineage = spark.table(lineage_table)
    clips = spark.table(clips_table)
    lin = lineage if lang is None else lineage.filter(
        F.col("lang_bucket") == lang
    )
    joined = lin.join(
        clips.select("record_id", "transcript"), "record_id", "inner"
    )
    lines = rust_lines(F.col("transcript"))
    content = F.array_join(
        F.slice(
            lines,
            F.col("line_start") + 1,
            F.col("line_end") - F.col("line_start") + 1,
        ),
        "\n",
    )
    return joined.select(
        "record_id",
        "chunk_id",
        "shard_id",
        "loc_in_shard",
        "lang_bucket",
        content.alias("content"),
    )
