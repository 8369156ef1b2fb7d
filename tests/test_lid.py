"""LID stage: Spark UDF output must equal direct per-row identify_doc
calls (batch/row parity), and the decision semantics must match the
reference rules (threshold 0.8, DOC_THRESHOLD 0.6, StrictMultilingual,
'\\0' stripping, multi label)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from ungoliant_spark.langdata import GIBBERISH_LABEL, sentence_of_min_chars
from ungoliant_spark.operators.lid import apply_lid, identify_doc


def _doc(rng, lang, n_lines, min_chars=101):
    return [sentence_of_min_chars(rng, lang, min_chars) for _ in range(n_lines)]


@pytest.fixture(scope="module")
def docs():
    rng = random.Random(123)
    out = {
        "en_mono": _doc(rng, "en", 6),
        "fr_mono": _doc(rng, "fr", 6),
        "fi_mono": _doc(rng, "fi", 3),
        "gibberish": _doc(rng, GIBBERISH_LABEL, 6),
        "multi_pos": _doc(rng, "en", 6) + _doc(rng, "fr", 6),
        "multi_imbalanced": _doc(rng, "en", 9) + _doc(rng, "fr", 1),
        "multi_too_many": (
            _doc(rng, "en", 2) + _doc(rng, "fr", 2) + _doc(rng, "de", 2)
            + _doc(rng, "es", 2) + _doc(rng, "it", 2) + _doc(rng, "pt", 2)
        ),
        "multi_too_short": _doc(rng, "en", 4) + _doc(rng, "fr", 4),
        "mostly_en_some_gib": _doc(rng, "en", 8) + _doc(rng, GIBBERISH_LABEL, 1),
        "nul_chars": [s.replace(" ", "\x00 ", 3) for s in _doc(rng, "de", 5)],
        "empty_lines": ["", "", ""],
    }
    return out


def test_identify_doc_semantics(docs):
    assert identify_doc(docs["en_mono"])[0] == "en"
    assert identify_doc(docs["fr_mono"])[0] == "fr"
    assert identify_doc(docs["fi_mono"])[0] == "fi"
    lang, prob, _, _ = identify_doc(docs["gibberish"])
    assert lang is None  # argmax bin is the unidentified bin → drop
    lang, prob, _, multi = identify_doc(docs["multi_pos"])
    assert (lang, multi) == ("multi", True)
    assert prob == 0.5
    lang, _, _, multi = identify_doc(docs["multi_imbalanced"])
    assert (lang, multi) == ("en", False)  # fr count < threshold
    lang, _, _, multi = identify_doc(docs["multi_too_many"])
    assert multi is False  # 6 langs > max 5
    lang, _, _, multi = identify_doc(docs["multi_too_short"])
    assert multi is False  # 8 lines < 10
    assert identify_doc(docs["mostly_en_some_gib"])[0] == "en"
    assert identify_doc(docs["nul_chars"])[0] == "de"  # \0 stripped
    assert identify_doc(docs["empty_lines"])[0] is None
    assert identify_doc([])[0] is None


def test_doc_confidence_threshold(docs):
    # en lines + a large unidentified byte mass → en wins bin argmax but
    # normalized confidence < 0.6 → dropped (pipeline.rs:284-286)
    rng = random.Random(5)
    en = _doc(rng, "en", 3)
    gib_bytes = _doc(rng, GIBBERISH_LABEL, 2, min_chars=250)
    lang, prob, _, _ = identify_doc(en + gib_bytes)
    assert lang is None


def test_spark_udf_matches_direct(spark, docs):
    rows = [(k, v) for k, v in docs.items()]
    df = spark.createDataFrame(rows, "name string, lines array<string>")
    got = {r["name"]: r for r in apply_lid(df).collect()}
    for name, lines in rows:
        lang, prob, slangs, multi = identify_doc(lines)
        r = got[name]
        assert r["lang"] == lang, name
        if prob is None:
            assert r["lang_prob"] is None
        else:
            assert abs(r["lang_prob"] - prob) < 1e-6, name
        assert r["multilingual"] == multi
        got_sl = [
            None if x is None else (x["label"], x["prob"]) for x in r["sentence_langs"]
        ]
        exp_sl = [None if x is None else (x[0], pytest.approx(x[1], abs=1e-6)) for x in slangs]
        assert got_sl == exp_sl or all(
            (a is None) == (b is None) for a, b in zip(got_sl, exp_sl)
        ), name


def test_tag_replace_matches_reference_table():
    """Every NEW_TAG_REPLACE entry from the reference
    (src/identifiers/tag_convert.rs:8-167) must be present verbatim —
    round-1 shipped only 11 of them."""
    import re

    from ungoliant_spark.operators.lid import TAG_REPLACE

    src = open(
        "/root/reference/src/identifiers/tag_convert.rs", encoding="utf-8"
    ).read()
    body = src.split("NEW_TAG_REPLACE")[1].split(".into_iter()")[0]
    entries = dict(re.findall(r'\("([^"]+)",\s*"([^"]+)"\)', body))
    assert len(entries) >= 150, len(entries)
    assert TAG_REPLACE == entries
    # deliberate absence, matching the reference: ("sh", "hbs") exists
    # only COMMENTED OUT in tag_convert.rs:243 ("hbs doesn't seem to
    # be valid bcp47" per its test comment at :239) — it is NOT in
    # NEW_TAG_REPLACE, so `sh` must pass through unmapped here too
    assert "sh" not in entries and "sh" not in TAG_REPLACE


def test_to_bcp47_conversion():
    """Mirrors the reference's tag tests (tag_convert.rs:210-253):
    old/new-style equivalence, script suffixes, table-10 fixes."""
    from ungoliant_spark.operators.lid import to_bcp47

    assert to_bcp47("__label__eng") == to_bcp47("__label__en") == "en"
    assert to_bcp47("__label__fra_Latn") == "fra-Latn"  # unmapped: _ -> -
    assert to_bcp47("__label__eml") == "x-eml"  # QaaG table 10
    assert to_bcp47("__label__als") == "gsw"  # QaaG table 10
    assert to_bcp47("__label__zho_Hans") == "zh-Hans"
    assert to_bcp47("__label__prs") == "fa-AF"
    assert to_bcp47("__label__abk") == "ab"
    assert to_bcp47("__label__zul") == "zu"


def _cycle(pattern, n):
    out = []
    i = 0
    while len(out) < n:
        out.append(pattern[i % len(pattern)])
        i += 1
    return out


def test_multilingual_lenient_reference_cases():
    """Ports multilingual.rs:316-336 (test_multilingual/2)."""
    from ungoliant_spark.operators.lid import multilingual_lenient

    assert multilingual_lenient([("en", 1.0)] * 10) is False
    ids = _cycle([("en", 1.0), ("en", 1.0), ("fr", 1.0), ("fr", 1.0)], 20)
    assert multilingual_lenient(ids) is True
    # 60 en lines need > 60/4 = 15 in the runner-up (rs docstring
    # example; note <= is rejecting, rs:271)
    assert multilingual_lenient([("en", 1.0)] * 60 + [("fr", 1.0)] * 15) is False
    assert multilingual_lenient([("en", 1.0)] * 60 + [("fr", 1.0)] * 16) is True
    # only the top `limit`=2 languages are examined (rs:252-256): a
    # too-small THIRD language cannot reject
    assert multilingual_lenient([("en", 1.0)] * 60 + [("de", 1.0)] * 25
                                + [("fr", 1.0)] * 1) is True
    # None may not hold the top rank (rs:244-248)
    assert multilingual_lenient([None] * 8 + [("en", 1.0)] * 6
                                + [("fr", 1.0)] * 6) is False


def test_strict_multilingual_bytes_reference_cases():
    """Ports multilingual.rs:338-515 (the byte-overload test suite)."""
    from ungoliant_spark.operators.lid import strict_multilingual_bytes

    en, fr = ("en", 1.0), ("fr", 1.0)
    # strict_bytes_false
    ids = _cycle([(en, 100), (en, 100), (fr, 1), (fr, 10), (fr, 10),
                  (fr, 10)], 20)
    assert strict_multilingual_bytes(ids) is False
    # strict_bytes_true
    ids = _cycle([(en, 100), (en, 110), (en, 111), (fr, 100), (fr, 130),
                  (fr, 10)], 20)
    assert strict_multilingual_bytes(ids) is True
    # strict_bytes_with_junk (take 200)
    ids = _cycle([(en, 100), (en, 110), (en, 111), (en, 45), (None, 100),
                  (None, 150), (fr, 100), (fr, 130), (fr, 130), (fr, 130),
                  (fr, 10)], 200)
    assert strict_multilingual_bytes(ids) is True
    # strict_bytes_no_junk (take 200)
    ids = _cycle([(en, 100), (en, 110), (en, 111), (en, 45), (fr, 100),
                  (fr, 130), (fr, 130), (fr, 130), (fr, 10)], 200)
    assert strict_multilingual_bytes(ids) is True
    # test_too_short / test_too_little_languages
    assert strict_multilingual_bytes(_cycle([(en, 100)], 2)) is False
    # test_not_confident_enough
    assert strict_multilingual_bytes(
        _cycle([(("en", 0.1), 100)], 2)) is False
    # test_too_much_none (take 2 of the 4-cycle)
    assert strict_multilingual_bytes(
        _cycle([(("en", 0.1), 100), (None, 100), (None, 100),
                (None, 100)], 2)) is False
    # test_too_much_languages (7 langs, take 10)
    seven = [(( lg, 0.1), 100) for lg in
             ("en", "fr", "uk", "fi", "uz", "pa", "zh")]
    assert strict_multilingual_bytes(_cycle(seven, 10)) is False


def test_predict_batch_vectorized_equals_per_line():
    """The vectorized batch path (token dedup + bulk FNV hashing +
    scatter-add assembly) must be BIT-identical to the sequential
    per-line path — including NUL bytes inside tokens (pandas
    factorize would silently collapse those: the reason dedup is a
    plain dict), non-ASCII ngrams, and >62-byte tokens (scalar
    fallback)."""
    import numpy as np

    from ungoliant_spark.lid_model import LidModel

    m = LidModel.load()
    mref = LidModel.load()
    lines = [
        "the people of this world were there because they could",
        "le français est une langue que nous avons déjà aujourd'hui",
        "on\x00 on al\x00so different tokens entirely",
        "héllo wörld àccénts ñiño 日本語 テスト",
        "a" * 200 + " normal words here",
        "",
        "   ",
        "<" * 70,
        "x",
    ]

    def ref_one(line, threshold=0.8):
        h = mref.hidden(line)
        if h is None:
            return None
        logits = h.astype(np.float64) @ mref.W.astype(np.float64) + mref.b
        logits -= logits.max()
        p = np.exp(logits)
        p /= p.sum()
        best = int(p.argmax())
        prob = float(np.float32(p[best]))
        label = mref.labels[best]
        if label in mref.junk or prob < threshold:
            return None
        return (label, prob)

    got = m.predict_batch(lines)
    exp = [ref_one(ln) for ln in lines]
    assert got == exp
    # token-vector cache values are the scalar path's, bit-for-bit
    toks = ["héllo", "日本語", "on\x00", "a" * 200, "x", "<>", "mixé"]
    V, C = m._token_vecs_bulk(toks)
    mtok = LidModel.load()
    for i, tk in enumerate(toks):
        v, c = mtok._token_vec(tk)
        assert np.array_equal(v, V[i]) and c == C[i], tk
