"""Language identification stage — the model operator.

Reference semantics (all in /root/reference):
  * per-line predict, k=1, prob threshold 0.8; below-threshold → None
    (src/identifiers/model.rs:64-89, builder defaults 251-259)
  * '\\0' chars stripped from lines before prediction (model.rs:126-129)
  * weighted_ids: per-language bins of (byte_count, Σ byte·prob f32);
    total byte count includes unidentified lines; normalize by total
    (model.rs:119-168; byte = UTF-8 len of the stripped line, :142)
  * StrictMultilingual on line ids (multilingual.rs:110-197 + defaults
    188-197) → doc lang 'multi', prob 0.5 (pipeline.rs:254-270)
  * doc vote: argmax bins by byte count; drop if argmax is the
    unidentified bin or confidence < DOC_THRESHOLD=0.6
    (pipeline.rs:272-311). Rust's max_by_key over a HashMap breaks
    byte-count ties nondeterministically; our frozen spec breaks them
    by (byte_count, label) with identified > unidentified.
  * fastText label → BCP-47 remap (src/identifiers/tag_convert.rs:
    7-167 NEW_TAG_REPLACE; strip '__label__' = 9 chars, :169-208)

Spark-first: one ArrowEvalPython stage (pandas UDF over the lines
array) produces a single struct column; everything downstream of it
(filters, partitioning) is Catalyst. The model is lazily loaded once
per executor process and reused across batches — the Spark analog of
the reference's per-thread model reuse.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from ungoliant_spark.config import (
    DOC_THRESHOLD,
    LID_LINE_THRESHOLD,
    MULTI_CONFIDENCE,
    MULTI_LABEL,
    MULTI_MAX_LANGS,
    MULTI_MIN_CONFIDENT_PCTG,
    MULTI_MIN_SENTENCES,
    MULTI_PROB,
)

# Subset of NEW_TAG_REPLACE (tag_convert.rs:7-167) covering our model's
# label set plus the documented quirk entries ("Quality at a Glance"
# table-10 fixes, tag_convert.rs:41,169-208).
TAG_REPLACE: dict[str, str] = {
    "eng": "en", "fra": "fr", "deu": "de", "spa": "es",
    "ita": "it", "por": "pt", "nld": "nl", "fin": "fi",
    "als": "gsw", "eml": "x-eml", "tgl": "fil",
}

SENTENCE_LANG_T = T.ArrayType(
    T.StructType(
        [
            T.StructField("label", T.StringType()),
            T.StructField("prob", T.FloatType()),
        ]
    )
)

LID_RESULT_T = T.StructType(
    [
        T.StructField("lang", T.StringType()),
        T.StructField("lang_prob", T.FloatType()),
        T.StructField("sentence_langs", SENTENCE_LANG_T),
        T.StructField("multilingual", T.BooleanType()),
    ]
)

_MODEL = None  # per-executor-process lazy singleton


def _get_model():
    global _MODEL
    if _MODEL is None:
        from ungoliant_spark.lid_model import LidModel

        _MODEL = LidModel.load()
    return _MODEL


def to_bcp47(ft_label: str) -> str:
    """'__label__xxx' → BCP-47 (strip 9 chars + remap table)."""
    raw = ft_label[9:]
    return TAG_REPLACE.get(raw, raw)


def strict_multilingual(line_ids: list[tuple[str, float] | None]) -> bool:
    """StrictMultilingual::detect over line identifications
    (multilingual.rs:110-186, defaults 188-197)."""
    nb_lines = len(line_ids)
    if nb_lines < MULTI_MIN_SENTENCES:
        return False
    nb_confident = sum(
        1 for i in line_ids if i is not None and i[1] >= MULTI_CONFIDENCE
    )
    if nb_confident / nb_lines <= MULTI_MIN_CONFIDENT_PCTG:
        return False
    counts: dict[str | None, int] = {}
    for i in line_ids:
        key = None if i is None else i[0]
        counts[key] = counts.get(key, 0) + 1
    nb_langs = sum(1 for k in counts if k is not None)
    if nb_langs < 2 or nb_langs > MULTI_MAX_LANGS:
        return False
    # threshold uses f32 division and includes the None bin in the key
    # count (multilingual.rs:156-158)
    count_threshold = math.floor(
        np.float32(nb_lines) / np.float32(len(counts))
    )
    for lang, count in counts.items():
        if lang is not None:
            if count < count_threshold:
                return False
        elif count > count_threshold:
            return False
    return True


def identify_doc(lines: list[str]) -> tuple:
    """weighted_ids + multilingual check + doc vote for one document.
    Returns (lang|None, prob|None, sentence_langs, multilingual)."""
    model = _get_model()
    bins: dict[str | None, list] = {}
    total = 0
    line_ids: list[tuple[str, float] | None] = []
    for line in lines:
        stripped = line.replace("\x00", "")
        pred = model.predict_one(stripped, threshold=LID_LINE_THRESHOLD)
        if pred is not None:
            label, prob = to_bcp47(pred[0]), np.float32(pred[1])
            line_ids.append((label, float(prob)))
        else:
            label, prob = None, None
            line_ids.append(None)
        # accumulate bins exactly as model.rs:131-156: every line adds
        # its byte count to its (possibly None) bin and to the total;
        # unidentified lines weight with prob 1.0 (unwrap_or(1.0))
        byte_count = len(stripped.encode("utf-8"))
        entry = bins.setdefault(label, [0, np.float32(0.0)])
        entry[0] += byte_count
        entry[1] = np.float32(
            entry[1]
            + np.float32(byte_count)
            * (prob if prob is not None else np.float32(1.0))
        )
        total += byte_count
    sentence_langs = line_ids
    if total > 0:
        for e in bins.values():
            e[1] = np.float32(e[1] / np.float32(total))
    if strict_multilingual(line_ids):
        return MULTI_LABEL, float(np.float32(MULTI_PROB)), sentence_langs, True
    # doc vote: max by byte count; frozen tie-break (bytes, identified, label)
    best = max(
        bins.items(),
        key=lambda kv: (kv[1][0], kv[0] is not None, kv[0] or ""),
        default=(None, [0, np.float32(0.0)]),
    )
    label, (byte_count, conf) = best
    if label is None:
        return None, None, sentence_langs, False
    if float(conf) < DOC_THRESHOLD:
        return None, None, sentence_langs, False
    return label, float(conf), sentence_langs, False


@pandas_udf(LID_RESULT_T)
def lid_udf(lines_series: pd.Series) -> pd.DataFrame:
    langs, probs, slangs, multis = [], [], [], []
    for lines in lines_series:
        lang, prob, sl, multi = identify_doc(
            list(lines) if lines is not None else []
        )
        langs.append(lang)
        probs.append(prob)
        slangs.append(
            [None if x is None else {"label": x[0], "prob": x[1]} for x in sl]
        )
        multis.append(multi)
    return pd.DataFrame(
        {
            "lang": langs,
            "lang_prob": probs,
            "sentence_langs": slangs,
            "multilingual": multis,
        }
    )


def apply_lid(df: DataFrame, lines_col: str = "lines") -> DataFrame:
    """Add lang / lang_prob / sentence_langs / lid_keep columns.

    Stage discipline (SURVEY.md §4): every Catalyst-native filter must
    already have run — Catalyst won't reorder predicates across this
    Python stage. Input column is only the lines array, so the audio
    ``bytes`` column never crosses the Arrow boundary.
    """
    res = lid_udf(F.col(lines_col))
    df = df.withColumn("_lid", res)
    return (
        df.withColumn("lang", F.col("_lid.lang"))
        .withColumn("lang_prob", F.col("_lid.lang_prob"))
        .withColumn("sentence_langs", F.col("_lid.sentence_langs"))
        .withColumn("multilingual", F.col("_lid.multilingual"))
        .withColumn("lid_keep", F.col("_lid.lang").isNotNull())
        .drop("_lid")
    )
