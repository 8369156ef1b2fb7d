"""Per-language perplexity scoring (``harmful_pp``) — the KenLM stage.

Reference: AdultDetector (/root/reference/src/transformers/kenlm/
adult_content.rs:9-61) runs *after* grouping documents by language
(pipeline.rs:328-358,499-503) so each model loads once; models are
lazily loaded per language (kenlm/lru.rs:54-169). The score is
recorded — never a drop. Newlines are replaced by spaces before
scoring (adult_content.rs:56-60).

Spark-first: a scalar Arrow pandas UDF over exactly two narrow
columns (lang, content) — the audio ``bytes`` column must NEVER
cross the Arrow boundary (a mapInPandas over the full row would ship
gigabytes of PCM through Python; measured 2× slower end-to-end).
Models are fetched from an executor-global dict cache keyed by lang:
each executor parses each language's model at most once — the cache
gives the same load-once behavior the reference gets from grouping.
For production-size KenLM models (GBs), pair this with
``salted_repartition`` (plans/pipeline.py) so a task sees few
languages; for our fixture-size ARPA models the cache alone is
optimal.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from ungoliant_spark.arpa import ARPA_DIR, ArpaModel, load_model

_MODELS: dict[str, ArpaModel | None] = {}  # executor-global


def _get_model(lang: str | None, arpa_dir: str) -> ArpaModel | None:
    if lang is None:
        return None
    if lang not in _MODELS:
        # load_model prefers <lang>.binary over <lang>.arpa
        # (reference: src/transformers/kenlm/lru.rs:86-91)
        _MODELS[lang] = load_model(lang, arpa_dir)
    return _MODELS[lang]


def make_perplexity_udf(arpa_dir: str | None = None):
    arpa_dir = arpa_dir or ARPA_DIR

    @pandas_udf(T.FloatType())
    def pp_udf(lang: pd.Series, content: pd.Series) -> pd.Series:
        out = []
        for lg, text in zip(lang, content):
            model = _get_model(lg, arpa_dir)
            if model is None or text is None:
                out.append(None)
            else:
                out.append(float(model.perplexity(text.replace("\n", " "))))
        return pd.Series(out, dtype="float32")

    return pp_udf


def apply_perplexity(
    df: DataFrame,
    content_col: str = "content",
    lang_col: str = "lang_bucket",
    arpa_dir: str | None = None,
) -> DataFrame:
    """Add ``harmful_pp`` (float, null when no model for the lang)."""
    udf = make_perplexity_udf(arpa_dir)
    return df.withColumn(
        "harmful_pp", udf(F.col(lang_col), F.col(content_col))
    )
