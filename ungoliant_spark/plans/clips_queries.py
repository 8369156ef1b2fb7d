"""Driver-contract queries over the clips (audio+transcript) table —
the BASELINE.json input_hint shape. The clips fixture is synthesized
deterministically (seed 42) at the scale factor matching ``sf_dir``;
no external data. These are model/binary operators with no SQL
equivalent → rows-only driver checks; their correctness gates live in
tests/ (F1 vs frozen labels, SNR, UDF-vs-direct parity).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ungoliant_spark.functions.lines import rust_lines
from ungoliant_spark.operators.audio_ops import audio_stats, resample
from ungoliant_spark.operators.lid import apply_lid
from ungoliant_spark.plans.pipeline import decide, kept_output
from ungoliant_spark.sources.fixtures import (
    ADULT_CATEGORY,
    ADULT_TERMS,
    generate,
)

TERM_MAP = {t: ADULT_CATEGORY for t in ADULT_TERMS}


def load_clips(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else 0.01
    d = generate(sf, with_labels=False)
    # defensive runtime confs: the caller's session may have defaults
    # sized for text tables; clips rows carry multi-KB..MB binary audio
    # (4096-row reader batches / 10k-row Arrow batches OOM on them)
    spark.conf.set("spark.sql.parquet.columnarReaderBatchSize", "512")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "512")
    return spark.read.parquet(f"{d}/clips.parquet")


def q_clips_decisions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full pipeline decision per clip (keep + reasons)."""
    df = decide(load_clips(spark, sf_dir), TERM_MAP)
    return df.select(
        "clip_id",
        "keep",
        "trim_keep",
        "pfilter_keep",
        "annotation_keep",
        "lid_keep",
        "lang",
        F.round("lang_prob", 5).alias("lang_prob"),
        F.size("quality_warnings").alias("n_warnings"),
    )


def q_clips_kept(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kept sink projection (metadata only — audio stays columnar)."""
    out = kept_output(decide(load_clips(spark, sf_dir), TERM_MAP))
    return out.select(
        "clip_id",
        "lang",
        F.round("lang_prob", 5).alias("lang_prob"),
        "quality_warnings",
        "categories",
        F.round("harmful_pp", 2).alias("harmful_pp"),
        "tlsh",
        "line_start",
        "line_end",
    )


def q_audio_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    stats = audio_stats(load_clips(spark, sf_dir))
    return stats.select(
        "clip_id",
        "decode_ok",
        "n_samples",
        F.round("rms", 3).alias("rms"),
        "peak",
        F.round("zcr", 5).alias("zcr"),
        F.round("centroid_hz", 2).alias("centroid_hz"),
    )


def q_audio_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    res = resample(load_clips(spark, sf_dir), target_sr=16000)
    return res.select(
        "clip_id", "target_sr", "n_samples_out",
        F.octet_length("bytes_out").alias("n_bytes_out"),
    )


def q_lid_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LID model over the shared documents table (one line per doc)."""
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    df = df.withColumn("lines", rust_lines(F.col("text")))
    return apply_lid(df).select(
        "doc_id", "lang", F.round("lang_prob", 5).alias("lang_prob")
    )
