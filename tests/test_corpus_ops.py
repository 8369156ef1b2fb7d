"""Cross-corpus dedup, benchmark decontamination, and C4-style
boilerplate line removal (operators/dedup.exact_dedup_against,
operators/decontam.py, operators/boilerplate.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ungoliant_spark.operators import boilerplate as bp
from ungoliant_spark.operators.decontam import flag_contaminated
from ungoliant_spark.operators.dedup import exact_dedup_against


def test_exact_dedup_against_semantics(spark):
    ref = spark.createDataFrame(
        [(1, "alpha beta"), (2, "Alpha  Beta"), (3, "gamma delta")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [
            (10, "alpha beta"),       # dup of ref (min ref id 1)
            (11, "epsilon zeta"),     # fresh
            (12, "epsilon zeta"),     # within-batch dup of 11
            (13, "GAMMA DELTA"),      # dup of ref via normalization
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r for r in exact_dedup_against(new, ref).collect()
    }
    assert got[10]["dup_of_ref"] == 1 and got[10]["is_dup"]
    assert got[13]["dup_of_ref"] == 3 and got[13]["is_dup"]
    assert got[11]["dup_of_ref"] is None and not got[11]["is_dup"]
    assert got[12]["dup_of_ref"] is None and got[12]["is_dup"]
    assert got[12]["rep_id"] == 11
    # plan: partial-aggregable, no windows
    plan = exact_dedup_against(new, ref)._jdf.queryExecution()\
        .executedPlan().toString()
    assert "Window" not in plan and "partial_min" in plan, plan


def test_flag_contaminated_counts_and_threshold(spark):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "quick brown fox somewhere else entirely here"),
            (3, "nothing shared with anything at all whatsoever"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps")], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r
        for r in flag_contaminated(docs, bench, n=3).collect()
    }
    # doc 1 shares 3 of bench's 3-grams; doc 2 shares 1; doc 3 none
    assert got[1]["n_overlap_ngrams"] == 3 and got[1]["contaminated"]
    assert got[2]["n_overlap_ngrams"] == 1 and got[2]["contaminated"]
    assert got[3]["n_overlap_ngrams"] == 0 and not got[3]["contaminated"]
    strict = {
        r["doc_id"]: r["contaminated"]
        for r in flag_contaminated(
            docs, bench, n=3, min_overlap=2
        ).collect()
    }
    assert strict == {1: True, 2: False, 3: False}
    with pytest.raises(ValueError, match="min_overlap"):
        flag_contaminated(docs, bench, min_overlap=0)
    # the benchmark gram set is broadcast (corpus never shuffled on it)
    plan = flag_contaminated(docs, bench)._jdf.queryExecution()\
        .executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan


@pytest.fixture()
def lined(spark):
    banner = "subscribe to our newsletter"
    rows = []
    for i in range(10):
        lines = [f"unique content {i} alpha", f"more content {i} beta"]
        if i < 8:  # banner in 80% of docs
            lines.insert(1, banner if i % 2 else "  Subscribe to our  Newsletter ")
        if i == 0:
            lines.append("")  # blank line: never boilerplate
        rows.append((f"c{i}", lines))
    return spark.createDataFrame(rows, "clip_id string, lines array<string>")


def test_line_doc_frequency(spark, lined):
    freq = {r["example"]: r["n_docs"]
            for r in bp.line_doc_frequency(lined).collect()}
    assert freq["subscribe to our newsletter"] == 8
    assert freq["unique content 3 alpha"] == 1
    assert "" not in freq


def test_remove_frequent_lines(spark, lined):
    out = {r["clip_id"]: r for r in
           bp.remove_frequent_lines(lined, max_doc_frac=0.5).collect()}
    # the banner (8/10 docs > 0.5) is gone everywhere, original order
    # and original (un-normalized) text preserved for survivors
    assert out["c1"]["lines"] == ["unique content 1 alpha",
                                  "more content 1 beta"]
    assert out["c1"]["n_boilerplate_lines"] == 1
    assert out["c9"]["lines"] == ["unique content 9 alpha",
                                  "more content 9 beta"]
    assert out["c9"]["n_boilerplate_lines"] == 0
    # blank line survives (never counted as boilerplate)
    assert "" in out["c0"]["lines"]
    # a permissive threshold keeps everything
    keep_all = bp.remove_frequent_lines(lined, max_doc_frac=1.0)
    assert keep_all.filter(F.col("n_boilerplate_lines") > 0).count() == 0
    with pytest.raises(ValueError, match="max_doc_frac"):
        bp.remove_frequent_lines(lined, max_doc_frac=0.0)


def test_remove_frequent_lines_on_clips_fixture(spark):
    """End-to-end on the real clips table: inject a banner line into
    every transcript's line array, remove at 50% — only the banner
    disappears and every other line survives in order."""
    from ungoliant_spark.sources.fixtures import generate

    clips = spark.read.parquet(f"{generate(0.001)}/clips.parquet").limit(50)
    lined = clips.select(
        "clip_id",
        F.concat(
            F.array(F.lit("FOLLOW US ON SOCIAL MEDIA")),
            F.split(F.col("transcript"), "\n"),
        ).alias("lines"),
    ).cache()
    out = bp.remove_frequent_lines(lined, max_doc_frac=0.5)
    joined = lined.select(
        "clip_id", F.col("lines").alias("orig")
    ).join(out, "clip_id")
    bad = joined.filter(
        (F.col("n_boilerplate_lines") != 1)
        | (F.size("lines") != F.size("orig") - 1)
        | (F.slice("orig", 2, F.size("orig") - 1) != F.col("lines"))
    )
    assert bad.count() == 0
    lined.unpersist()


def test_audio_quality_gate_signals(spark):
    """Each audio gate signal fires on purpose-built PCM: silence →
    too_quiet, full-scale square → clipped, half-dead clip →
    silence_ratio 0.5 boundary (kept), mostly-dead → dropped, bad
    codec → decode_ok false with null signals and keep false."""
    import numpy as np

    from ungoliant_spark.operators.audio_ops import audio_quality

    sr = 16000
    loud = (np.sin(np.arange(sr) * 0.05) * 8000).astype("<i2")
    silent = np.zeros(sr, dtype="<i2")
    square = np.where(np.arange(sr) % 2 == 0, 32767, -32767).astype("<i2")
    half = np.concatenate([silent[: sr // 2], loud[: sr // 2]])
    mostly = np.concatenate([silent[: 3 * sr // 4], loud[: sr // 4]])
    rows = [
        ("ok", loud.tobytes(), "pcm_s16le"),
        ("quiet", silent.tobytes(), "pcm_s16le"),
        ("clip", square.tobytes(), "pcm_s16le"),
        ("half", half.tobytes(), "pcm_s16le"),
        ("mostly", mostly.tobytes(), "pcm_s16le"),
        ("bad", b"\x00\x01", "mp3"),
    ]
    df = spark.createDataFrame(
        [(cid, bytearray(b), c, sr, 1000) for cid, b, c in rows],
        "clip_id string, bytes binary, codec string, sr_hz int, dur_ms int",
    )
    got = {r["clip_id"]: r for r in audio_quality(df).collect()}
    assert got["ok"]["audio_keep"] and not got["ok"]["too_quiet"]
    assert got["quiet"]["too_quiet"] and not got["quiet"]["audio_keep"]
    assert got["clip"]["clipped"] and not got["clip"]["audio_keep"]
    # exactly half the 8 frames dead → ratio 0.5 ≤ bound → kept
    assert got["half"]["silence_ratio"] == 0.5 and got["half"]["audio_keep"]
    assert got["mostly"]["silence_ratio"] == 0.75
    assert not got["mostly"]["audio_keep"]
    assert not got["bad"]["decode_ok"]
    assert got["bad"]["too_quiet"] is None
    assert got["bad"]["audio_keep"] is False


def test_repetition_signals_gopher_rules(spark):
    """Crafted docs pin the Gopher repetition math: a pure repeat
    scores dup-frac near 1 with the top gram covering most chars; a
    no-repeat doc scores 0/low; docs shorter than n score 0 on both;
    the mode tie-break is the deterministic (count, gram) struct
    max."""
    from ungoliant_spark.operators.repetition import repetition_signals

    docs = spark.createDataFrame(
        [
            (1, "spam spam spam spam spam spam"),
            (2, "one two three four five six"),
            (3, "hi"),                      # < 2 tokens: no 2-grams
            (4, "a b a b c d c d"),         # 2-gram tie: "a b" vs "c d"
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in repetition_signals(docs).collect()}
    # doc 1: five identical 2-grams "spam spam" → dup2 = 1 - 1/5
    assert got[1]["dup2_frac"] == 0.8
    # top 2-gram "spam spam" (9 chars) occurs 5x over 29 chars
    assert got[1]["top2_char_frac"] == round(5 * 9 / 29, 6)
    assert got[2]["dup2_frac"] == 0.0 and got[2]["dup3_frac"] == 0.0
    assert got[3]["dup2_frac"] == 0.0 and got[3]["top2_char_frac"] == 0.0
    # tie at count 2: ("a b", 2) vs ("c d", 2) → struct max picks the
    # lexicographically LARGER gram "c d" in both engines
    assert got[4]["top2_char_frac"] == round(2 * 3 / 15, 6)
    # plan: mode computed via partial-aggregable groupBys, no window
    plan = repetition_signals(docs)._jdf.queryExecution()\
        .executedPlan().toString()
    assert "Window" not in plan and "partial_count" in plan, plan
