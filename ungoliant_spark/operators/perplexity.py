"""Per-language perplexity scoring (``harmful_pp``) — the KenLM stage.

Reference: AdultDetector (/root/reference/src/transformers/kenlm/
adult_content.rs:9-61) runs *after* grouping documents by language
(pipeline.rs:328-358,499-503) so each model loads once; models are
lazily loaded per language with binary-over-arpa preference
(kenlm/lru.rs:54-169). The score is recorded — never a drop
(pp_thresh exists but only gates recording, adult_content.rs:42-55).

Spark-first translation of that execution shape:

    repartition(lang_bucket, salt) → mapInPandas(score_batch)

The salted repartition bounds the dominant language's partition size
(skew); inside each task, models are fetched from an executor-global
dict cache keyed by lang, so a model is parsed at most once per
executor process — the exact analog of the reference's
group-then-load-once. Newlines are replaced by spaces before scoring
(adult_content.rs:56-60).
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ungoliant_spark.arpa import ARPA_DIR, ArpaModel

_MODELS: dict[str, ArpaModel | None] = {}  # executor-global


def _get_model(lang: str | None, arpa_dir: str) -> ArpaModel | None:
    if lang is None:
        return None
    if lang not in _MODELS:
        path = os.path.join(arpa_dir, f"{lang}.arpa")
        _MODELS[lang] = ArpaModel.load(path) if os.path.exists(path) else None
    return _MODELS[lang]


def apply_perplexity(
    df: DataFrame,
    content_col: str = "content",
    lang_col: str = "lang_bucket",
    arpa_dir: str | None = None,
    n_partitions: int | None = None,
    salt_buckets: int = 16,
) -> DataFrame:
    """Add ``harmful_pp`` (float, null when no model for the lang)."""
    arpa_dir = arpa_dir or ARPA_DIR
    schema = T.StructType(
        df.schema.fields + [T.StructField("harmful_pp", T.FloatType())]
    )

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pps = []
            for lang, content in zip(pdf[lang_col], pdf[content_col]):
                model = _get_model(lang, arpa_dir)
                if model is None or content is None:
                    pps.append(None)
                else:
                    pps.append(
                        float(model.perplexity(content.replace("\n", " ")))
                    )
            pdf = pdf.copy()
            pdf["harmful_pp"] = pd.Series(pps, dtype="float32")
            yield pdf

    # salt must vary per ROW within a language (a hash of the lang alone
    # would leave each language in one task) — hash the content
    salt = F.pmod(
        F.xxhash64(F.coalesce(F.col(content_col), F.lit(""))),
        F.lit(salt_buckets),
    )
    if n_partitions:
        df = df.repartition(n_partitions, F.col(lang_col), salt)
    else:
        df = df.repartition(F.col(lang_col), salt)
    return df.mapInPandas(score, schema=schema)
