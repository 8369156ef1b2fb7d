"""OSCAR-document JSONL sink — the reference's primary output format.

The reference's LangFilesDoc writer emits one gzip'd JSONL file set
per language (src/io/langfiles.rs; doc type from the oscar-io crate),
each line an OSCAR 22.01-schema document:

    {"content": ...,
     "metadata": {
        "identification": {"label": ..., "prob": ...},
        "harmful_pp": ...,
        "tlsh": ...,
        "quality_warnings": [...],
        "categories": [...],
        "sentence_identifications": [{"label","prob"} | null, ...]}}

(The schema is public — OSCAR 22.01 dataset documentation. WARC
headers don't exist here: the input is a clips table, so the
source-identity field is ``clip_id``, carried alongside audio shape
metadata under ``clip``.)

Spark mapping: one `to_json(struct(...))` projection (pure Catalyst,
whole-stage codegen) + a text sink partitioned by language bucket
with gzip codec — the lang fan-out is `partitionBy`, not a
per-language loop, so one job writes every language in parallel and
skewed languages are already salted upstream
(plans/pipeline.py::salted_repartition).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def oscar_document_json(df: DataFrame) -> DataFrame:
    """(lang_bucket, value) where value is the OSCAR-schema JSON line.
    Null metadata fields are kept as JSON nulls (the reference
    serializes Option::None the same way). The checkpointed kept table
    drops the heavy sentence_langs column before committing
    (plans/checkpoint.py), so sentence identifications serialize as
    null when packaging from a committed table and as the real array
    when packaging an in-flight DataFrame."""
    sent = (
        F.col("sentence_langs")
        if "sentence_langs" in df.columns
        else F.lit(None).cast(
            "array<struct<label:string,prob:float>>"
        )
    )
    meta = F.struct(
        F.struct(
            F.col("lang").alias("label"),
            F.col("lang_prob").alias("prob"),
        ).alias("identification"),
        F.col("harmful_pp").alias("harmful_pp"),
        F.col("tlsh").alias("tlsh"),
        F.col("quality_warnings").alias("quality_warnings"),
        F.col("categories").alias("categories"),
        sent.alias("sentence_identifications"),
        F.struct(
            F.col("clip_id").alias("clip_id"),
            F.col("sr_hz").alias("sr_hz"),
            F.col("dur_ms").alias("dur_ms"),
            F.col("codec").alias("codec"),
        ).alias("clip"),
    )
    doc = F.struct(
        F.col("transcript").alias("content"), meta.alias("metadata")
    )
    return df.select(
        "lang_bucket",
        F.to_json(doc, {"ignoreNullFields": "false"}).alias("value"),
    )


def write_jsonl_by_lang(df: DataFrame, out_dir: str) -> None:
    """Write kept rows as gzip JSONL partitioned by language —
    `<out_dir>/lang_bucket=<lang>/part-*.txt.gz`, the LangFilesDoc
    layout (one file set per lang) as a single parallel Spark job."""
    (
        oscar_document_json(df)
        .write.mode("overwrite")
        .partitionBy("lang_bucket")
        .option("compression", "gzip")
        .text(out_dir)
    )
