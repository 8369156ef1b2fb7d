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

# The full NEW_TAG_REPLACE table (tag_convert.rs:8-167): ISO-639-3
# (optionally _Script) fastText labels → BCP-47. Includes the
# "Quality at a Glance" table-10 fixes (als→gsw, eml→x-eml) and the
# lid.176.bin-era remaps (tgl→fil, prs→fa-AF).
TAG_REPLACE: dict[str, str] = {
    "abk": "ab", "ace_Arab": "ace-Arab", "ace_Latn": "ace-Latn",
    "afr": "af", "aka": "ak", "als": "gsw", "amh": "am",
    "ara_Arab": "ar-Arab", "ara_Latn": "ar-Latn", "asm": "as",
    "bak": "ba", "bam": "bm", "bel": "be", "ben": "bn", "bis": "bi",
    "bjn_Arab": "bjn-Arab", "bjn_Latn": "bjn-Latn", "bod": "bo",
    "bos": "bs", "bul": "bg", "cat": "ca", "ces": "cs", "che": "ce",
    "chv": "cv", "crh_Latn": "crh-Latn", "cym": "cy", "dan": "da",
    "deu": "de", "dzo": "dz", "ell": "el", "eml": "x-eml",
    "eng": "en", "epo": "eo", "est": "et", "eus": "eu", "ewe": "ee",
    "fao": "fo", "fas": "fa", "fij": "fj", "fin": "fi", "fra": "fr",
    "gla": "gd", "gle": "ga", "glg": "gl", "grn": "gn", "guj": "gu",
    "hat": "ht", "hau": "ha", "heb": "he", "hin": "hi", "hrv": "hr",
    "hun": "hu", "hye": "hy", "ibo": "ig", "ind": "id", "isl": "is",
    "ita": "it", "jav": "jv", "jpn": "ja", "kal": "kl", "kan": "kn",
    "kas_Arab": "ks-Arab", "kas_Deva": "ks-Deva", "kat": "ka",
    "kau_Arab": "kr-Arab", "kau_Latn": "kr-Latn", "kaz": "kk",
    "khm": "km", "kik": "ki", "kin": "rw", "kir": "ky", "kon": "kg",
    "kor": "ko", "kur": "ku", "lao": "lo", "lav": "lv", "lim": "li",
    "lin": "ln", "lit": "lt", "ltz": "lb", "lug": "lg", "mal": "ml",
    "mar": "mr", "min_Latn": "min-Latn", "mkd": "mk", "mlg": "mg",
    "mlt": "mt", "mni_Mtei": "mni-Mtei", "mon": "mn", "mri": "mi",
    "msa": "ms", "mya": "my", "nav": "nv", "nld": "nl", "nno": "nn",
    "nob": "nb", "nya": "ny", "oci": "oc", "orm": "om", "oss": "os",
    "pan": "pa", "pol": "pl", "por": "pt", "prs": "fa-AF",
    "pus": "ps", "que": "qu", "roh": "rm", "ron": "ro", "run": "rn",
    "rus": "ru", "sag": "sg", "san": "sa", "sin": "si", "slk": "sk",
    "slv": "sl", "smo": "sm", "sna": "sn", "snd": "sd", "som": "so",
    "sot": "st", "spa": "es", "sqi": "sq", "srd": "sc",
    "srp_Cyrl": "sr-Cyrl", "ssw": "ss", "sun": "su", "swe": "sv",
    "tah": "ty", "tam": "ta", "tat_Cyrl": "tt-Cyrl", "tel": "te",
    "tgk": "tg", "tgl": "fil", "tha": "th", "tir": "ti",
    "tmh_Latn": "tmh-Latn", "tmh_Tfng": "tmh-Tfng", "ton": "to",
    "tsn": "tn", "tso": "ts", "tuk": "tk", "tur": "tr", "twi": "tw",
    "uig": "ug", "ukr": "uk", "urd": "ur", "uzb": "uz", "vie": "vi",
    "wol": "wo", "xho": "xh", "yid": "yi", "yor": "yo",
    "zho_Hans": "zh-Hans", "zho_Hant": "zh-Hant", "zul": "zu",
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
    """Per-executor model: the committed fixture npz by default; set
    UNGOLIANT_LID_BIN=/path/lid.176.bin to run the real fastText
    weights through the same inference code (fasttext_bin.py)."""
    global _MODEL
    if _MODEL is None:
        import os

        bin_path = os.environ.get("UNGOLIANT_LID_BIN")
        if bin_path:
            from ungoliant_spark.fasttext_bin import load_fasttext_bin

            _MODEL = load_fasttext_bin(bin_path)
        else:
            from ungoliant_spark.lid_model import LidModel

            _MODEL = LidModel.load()
    return _MODEL


def to_bcp47(ft_label: str) -> str:
    """'__label__xxx' → BCP-47: strip 9 chars, remap table, then
    '_'→'-' for unmapped script-suffixed labels (Tag::fix,
    tag_convert.rs:183-199 — e.g. 'fra_Latn' → 'fra-Latn')."""
    raw = ft_label[9:]
    tag = TAG_REPLACE.get(raw, raw)
    return tag.replace("_", "-") if "_" in tag else tag


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


def strict_multilingual_bytes(
    items: list[tuple[tuple[str, float] | None, int]],
    min_sentences: int = MULTI_MIN_SENTENCES,
    threshold_confidence: float = MULTI_CONFIDENCE,
    max_langs: int | None = MULTI_MAX_LANGS,
    min_confident_pctg: float = MULTI_MIN_CONFIDENT_PCTG,
) -> bool:
    """Byte-weighted StrictMultilingual overload (multilingual.rs:
    42-106): each item is (identification|None, nb_bytes); every
    present language must hold at least total_bytes/(n_bins) bytes and
    the unidentified bytes at most that. Unwired in the reference
    pipeline (only the line-based overload is called) — implemented
    for completeness, same policy as MeanLength/Conv.

    Fidelity notes: the Rust byte overload PRE-INSERTS the None bin
    (multilingual.rs:68 ``bytes_per_lang.insert(None, 0)``), so the
    bin count — and therefore the threshold divisor — always includes
    "unidentified" even when every line identified; the threshold
    divides in f32 and floors (rs:87-88)."""
    nb_bytes = sum(b for _, b in items)
    nb_lines = len(items)
    if nb_lines < min_sentences:
        return False
    nb_confident = sum(
        1 for i, _ in items if i is not None and i[1] >= threshold_confidence
    )
    if nb_confident / nb_lines <= min_confident_pctg:
        return False
    bytes_per_lang: dict[str | None, int] = {None: 0}
    for ident, b in items:
        key = None if ident is None else ident[0]
        bytes_per_lang[key] = bytes_per_lang.get(key, 0) + b
    nb_langs = sum(1 for k in bytes_per_lang if k is not None)
    if nb_langs < 2 or (max_langs is not None and nb_langs > max_langs):
        return False
    count_threshold = math.floor(
        np.float32(nb_bytes) / np.float32(len(bytes_per_lang))
    )
    for lang, count in bytes_per_lang.items():
        if lang is not None:
            if count < count_threshold:
                return False
        elif count > count_threshold:
            return False
    return True


def multilingual_lenient(
    line_ids: list[tuple[str, float] | None],
    min_sentences: int = 10,
    limit: int = 2,
    q: float = 4.0,
) -> bool:
    """Lenient Multilingual (multilingual.rs:208-295): rank language
    line counts descending and require C_(n+1) > C_n / q over the
    first ``limit`` languages. Unwired in the reference pipeline —
    implemented for completeness.

    Fidelity note: the Rust code ranks with ``sorted_unstable_by`` on
    count only, so the relative order of TIED counts (including a tie
    between the top language and the None bin, rs:244-248) is
    unspecified — it inherits HashMap iteration order. This port
    freezes a deterministic spec: ties rank identified-before-None,
    then label ascending, which makes the is-first-None rejection the
    most permissive reading consistent with the Rust code."""
    if len(line_ids) < min_sentences:
        return False
    counts: dict[str | None, int] = {}
    for i in line_ids:
        key = None if i is None else i[0]
        counts[key] = counts.get(key, 0) + 1
    nb_langs = sum(1 for k in counts if k is not None)
    if nb_langs < 2:
        return False
    ordered = sorted(
        counts.items(),
        key=lambda kv: (-kv[1], kv[0] is None, kv[0] or ""),
    )
    if ordered[0][0] is None:
        return False
    langs = [(k, c) for k, c in ordered if k is not None][:limit]
    first_count = langs[0][1]
    threshold = np.float32(first_count) / np.float32(q)
    for _, count in langs[1:]:
        if np.float32(count) <= threshold:
            return False
        threshold = np.float32(count) / np.float32(q)
    return True


def _doc_from_preds(
    stripped_lines: list[str],
    preds: list[tuple[str, float] | None],
) -> tuple:
    """weighted_ids + multilingual check + doc vote given per-line
    predictions. Returns (lang|None, prob|None, sentence_langs,
    multilingual)."""
    bins: dict[str | None, list] = {}
    total = 0
    line_ids: list[tuple[str, float] | None] = []
    for stripped, pred in zip(stripped_lines, preds):
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


def identify_doc(lines: list[str]) -> tuple:
    """Single-document convenience/oracle path (same math as the
    batched UDF: both go through LidModel.predict_batch)."""
    model = _get_model()
    stripped = [ln.replace("\x00", "") for ln in lines]
    preds = model.predict_batch(stripped, threshold=LID_LINE_THRESHOLD)
    return _doc_from_preds(stripped, preds)


@pandas_udf(LID_RESULT_T)
def lid_udf(lines_series: pd.Series) -> pd.DataFrame:
    """Batched LID: all lines of the whole Arrow batch are scored in
    ONE matmul (LidModel.predict_batch), then regrouped per document
    — no per-row model invocation."""
    model = _get_model()
    docs: list[list[str]] = [
        [
            ln.replace("\x00", "")
            for ln in (lines if lines is not None else [])
        ]
        for lines in lines_series
    ]
    flat = [ln for doc in docs for ln in doc]
    flat_preds = model.predict_batch(flat, threshold=LID_LINE_THRESHOLD)
    langs, probs, slangs, multis = [], [], [], []
    pos = 0
    for doc in docs:
        preds = flat_preds[pos : pos + len(doc)]
        pos += len(doc)
        lang, prob, sl, multi = _doc_from_preds(doc, preds)
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

    The UDF is deterministic in fact but marked nondeterministic so a
    downstream ``filter`` on its outputs cannot inline the call into
    the predicate — that would duplicate the whole model evaluation
    into a second ArrowEvalPython node (measured ~2× model cost).
    """
    res = lid_udf.asNondeterministic()(F.col(lines_col))
    df = df.withColumn("_lid", res)
    return (
        df.withColumn("lang", F.col("_lid.lang"))
        .withColumn("lang_prob", F.col("_lid.lang_prob"))
        .withColumn("sentence_langs", F.col("_lid.sentence_langs"))
        .withColumn("multilingual", F.col("_lid.multilingual"))
        .withColumn("lid_keep", F.col("_lid.lang").isNotNull())
        .drop("_lid")
    )
