"""Resumable chunked pipeline runs: lineage + metrics + kept sinks
with snapshot checkpointing.

Replaces the reference's file-level idempotence (one output file per
shard; rerun skips existing files) with table-level snapshot commits
(SURVEY.md §4): the input is split into deterministic hash-range
chunks, each chunk is processed by one Spark job and committed as one
atomic snapshot append to three tables (kept / lineage / metrics);
resuming diffs the desired chunk set against the snapshot summary.

Lineage rows are the ShardResult equivalent (/root/reference/src/
pipelines/oscardoc/types/rebuild.rs:104-213): one row per kept doc
with (chunk_id, shard_id = spark task partition, record_id = clip_id,
line_start/line_end inclusive, loc_in_shard), written sorted by
loc_in_shard within partitions (rebuild.rs:194-198).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ungoliant_spark.plans.pipeline import run as pipeline_run
from ungoliant_spark.sources.tables import SnapshotTable


def chunk_filter(df: DataFrame, chunk: int, n_chunks: int) -> DataFrame:
    """Deterministic hash-range chunking on the primary key."""
    return df.filter(
        F.pmod(F.xxhash64(F.col("clip_id")), F.lit(n_chunks)) == F.lit(chunk)
    )


def lineage_of(kept: DataFrame, chunk_id: str) -> DataFrame:
    w = Window.partitionBy("shard_id").orderBy("record_id")
    return (
        kept.select(
            F.lit(chunk_id).alias("chunk_id"),
            F.spark_partition_id().cast("long").alias("shard_id"),
            F.col("clip_id").alias("record_id"),
            "line_start",
            "line_end",
            "lang_bucket",
        )
        .withColumn("loc_in_shard", F.row_number().over(w).cast("long") - 1)
        .sortWithinPartitions("loc_in_shard")
    )


def metrics_of(kept: DataFrame, chunk_id: str) -> DataFrame:
    """Per-(chunk, lang) counters — the reference's per-lang doc-count
    logging (pipeline.rs:371) promoted to a real metrics table."""
    return kept.groupBy("lang_bucket").agg(
        F.lit(chunk_id).alias("chunk_id"),
        F.count("*").alias("n_docs"),
        F.sum("dur_ms").alias("sum_dur_ms"),
        F.sum(F.octet_length("bytes")).alias("sum_audio_bytes"),
        F.avg("harmful_pp").alias("avg_harmful_pp"),
        F.sum(F.length("transcript")).alias("sum_transcript_chars"),
    )


class CheckpointedRun:
    def __init__(self, out_root: str):
        self.out_root = out_root
        self.kept = SnapshotTable(f"{out_root}/kept")
        self.lineage = SnapshotTable(f"{out_root}/lineage")
        self.metrics = SnapshotTable(f"{out_root}/metrics")

    def committed_chunks(self) -> set[str]:
        """A chunk counts as done only when ALL THREE tables have it:
        a crash between the per-table appends must re-run the chunk
        (appends are idempotent), otherwise the chunk's lineage or
        metrics rows would be silently lost forever."""
        return (
            self.kept.committed_chunks()
            & self.lineage.committed_chunks()
            & self.metrics.committed_chunks()
        )

    def _write_schema_json(self, kept: DataFrame) -> None:
        """metadata_schema.json beside the sinks — the reference
        writes it post-run (/root/reference/src/main.rs:64-69)."""
        import os

        path = os.path.join(self.kept.root, "..", "metadata_schema.json")
        with open(os.path.abspath(path), "w", encoding="utf-8") as f:
            f.write(kept.schema.json())

    def run(
        self,
        clips: DataFrame,
        n_chunks: int,
        term_to_category: dict[str, str] | None = None,
        n_partitions: int | None = None,
        fail_after: int | None = None,  # test hook: simulate a crash
    ) -> set[str]:
        """Process all not-yet-committed chunks; returns chunk ids
        committed by THIS invocation. Safe to re-run after any crash."""
        done = self.committed_chunks()
        committed: set[str] = set()
        schema_written = False
        for chunk in range(n_chunks):
            chunk_id = f"chunk-{chunk:05d}"
            if chunk_id in done:
                continue
            if fail_after is not None and len(committed) >= fail_after:
                raise RuntimeError("simulated crash between snapshots")
            part = chunk_filter(clips, chunk, n_chunks)
            kept = pipeline_run(
                part, term_to_category, n_partitions
            ).cache()
            try:
                if not schema_written:
                    self._write_schema_json(kept.drop("sentence_langs"))
                    schema_written = True
                # kept commits LAST: resume keys on the intersection,
                # but ordering side tables first means a torn chunk
                # can never present kept rows without their lineage
                self.lineage.append(lineage_of(kept, chunk_id), chunk_id)
                self.metrics.append(metrics_of(kept, chunk_id), chunk_id)
                self.kept.append(kept.drop("sentence_langs"), chunk_id)
            finally:
                kept.unpersist()
            committed.add(chunk_id)
        return committed


def rebuild(
    lineage: DataFrame, clips: DataFrame, lang: str | None = None
) -> DataFrame:
    """Inverse pipeline (Rebuilder::run, /root/reference/src/
    processing/rebuild.rs:234-305): join lineage against the source
    table on the record id and re-slice the kept line range — the
    reference's seek/verify/re-slice loop as one DataFrame join."""
    from ungoliant_spark.functions.lines import rust_lines

    lin = lineage if lang is None else lineage.filter(
        F.col("lang_bucket") == lang
    )
    joined = lin.join(
        clips.select("clip_id", "transcript"),
        lin.record_id == clips.clip_id,
        "inner",
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
