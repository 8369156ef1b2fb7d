"""Driver-contract queries over the shared ``documents`` test table
(doc_id, text, lang, source, n_chars) — each heuristic stage exposed
as a (spark, sf_dir) -> DataFrame callable with a DuckDB oracle twin
in :mod:`ungoliant_spark.oracle_sql`.

Column names/types are aligned 1:1 with the oracle SQL (the driver
hash-compares values after sorting columns by name).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ungoliant_spark.operators.annotators import apply_annotators
from ungoliant_spark.operators.pfilter import apply_pfilter
from ungoliant_spark.operators.scrub import apply_scrub, scrub
from ungoliant_spark.operators.trim import apply_trim


def load_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def heuristic_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → full heuristic chain (trim → pfilter → annotate →
    scrub), all pure Catalyst. One narrow projection feeds every
    driver query below; Catalyst prunes unused columns per query."""
    df = load_documents(spark, sf_dir).withColumnRenamed("text", "transcript")
    df = apply_trim(df)
    df = apply_pfilter(df)
    df = apply_annotators(df)
    df = apply_scrub(df)
    keep = (
        F.col("trim_keep")
        & F.col("pfilter_keep")
        & F.col("annotation_keep")
    )
    return df.withColumn("keep", keep)


def q_trim_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    return heuristic_frame(spark, sf_dir).select(
        "doc_id",
        F.col("trim_keep"),
        F.col("line_start").cast("int").alias("line_start"),
        F.col("line_end").cast("int").alias("line_end"),
        F.col("content"),
    )


def q_pfilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = heuristic_frame(spark, sf_dir)
    return df.filter(F.col("trim_keep")).select("doc_id", "pfilter_keep")


def q_quality_annotations(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = heuristic_frame(spark, sf_dir)
    return df.filter(F.col("trim_keep") & F.col("pfilter_keep")).select(
        "doc_id",
        F.array_join("quality_warnings", ",").alias("warnings"),
        "annotation_keep",
    )


def q_heuristic_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = heuristic_frame(spark, sf_dir)
    return df.select(
        "doc_id",
        "keep",
        F.when(F.col("keep"), F.col("scrubbed")).alias("scrubbed"),
    )


def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scrub applied to the raw text directly (content-rewriter op)."""
    df = load_documents(spark, sf_dir)
    return df.select("doc_id", scrub(F.col("text")).alias("scrubbed"))


def q_meanlength(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MeanLength per-line keep flags (sentence.rs:44-112) — the
    reference's unwired running-mean/std sentence filter, serialized
    as a '1'/'0' CSV string per doc for the driver canonicalizer."""
    from ungoliant_spark.functions.lines import rust_lines
    from ungoliant_spark.operators.extra_filters import meanlength_flags

    df = load_documents(spark, sf_dir)
    flags = meanlength_flags(rust_lines(F.col("text")))
    return df.select(
        "doc_id",
        F.array_join(
            F.transform(
                flags, lambda b: F.when(b, F.lit("1")).otherwise(F.lit("0"))
            ),
            ",",
        ).alias("flags"),
    )


def q_conv_trim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conv moving-average trimmer (sentence_filter.rs:70-149) — the
    reference's unwired convolutional RemoveShortSentences variant."""
    from ungoliant_spark.operators.extra_filters import apply_conv_trim

    df = load_documents(spark, sf_dir).withColumnRenamed(
        "text", "transcript"
    )
    return apply_conv_trim(df).select(
        "doc_id",
        F.col("conv_line_start").alias("line_start"),
        F.col("conv_line_end").alias("line_end"),
        F.coalesce("conv_content", F.lit("")).alias("content"),
    )


def q_keep_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source keep metrics — the metrics-table aggregation
    (reference per-lang doc counts, pipeline.rs:371) exercised as a
    partial-agg groupBy."""
    df = heuristic_frame(spark, sf_dir)
    return df.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(F.col("keep").cast("long")).alias("n_keep"),
        F.sum(F.col("trim_keep").cast("long")).alias("n_trim_keep"),
        F.sum(
            (F.col("trim_keep") & F.col("pfilter_keep")).cast("long")
        ).alias("n_pfilter_keep"),
    )
