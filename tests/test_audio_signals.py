"""Cross-modal and VAD quality signals (audio_ops.speech_rate /
audio_ops.audio_vad): math pins on crafted rows, and plan gates
proving speech_rate never touches the audio bytes (pure Catalyst over
two scalar columns) while audio_vad adds no second Python pass beyond
the shared audio_stats decode."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ungoliant_spark.operators.audio_ops import (
    N_FRAMES,
    RMS_SILENCE,
    audio_vad,
    speech_rate,
)
from ungoliant_spark.sources.fixtures import generate

SF = 0.001


@pytest.fixture(scope="module")
def fx_dir():
    return generate(SF)


def test_speech_rate_math(spark):
    rows = [
        ("a", "one two three four", 2000),     # 2.0 tps, ok
        ("b", "  spaced   out  words ", 3000),  # 3 tokens / 3 s = 1.0
        ("c", "", 1000),                        # 0 tokens -> 0.0, fail
        ("d", "x " * 100, 4000),                # 25 tps -> fail (too fast)
        ("e", "one", 60_000),                   # 0.0167 -> fail (too slow)
    ]
    df = spark.createDataFrame(
        rows, "clip_id string, transcript string, dur_ms int"
    )
    got = {r["clip_id"]: r for r in speech_rate(df).collect()}
    assert got["a"]["n_tokens"] == 4 and got["a"]["tokens_per_s"] == 2.0
    assert got["a"]["rate_ok"]
    assert got["b"]["n_tokens"] == 3 and got["b"]["tokens_per_s"] == 1.0
    assert got["c"]["n_tokens"] == 0 and not got["c"]["rate_ok"]
    assert got["d"]["tokens_per_s"] == 25.0 and not got["d"]["rate_ok"]
    assert got["e"]["n_tokens"] == 1 and not got["e"]["rate_ok"]
    assert got["a"]["dur_s"] == 2.0


def test_speech_rate_plan_pure_catalyst(spark, fx_dir):
    """No Python node anywhere, and the parquet scan reads only the
    two scalar columns — the multi-KB/MB audio bytes never leave the
    file footer."""
    clips = spark.read.parquet(f"{fx_dir}/clips.parquet")
    qe = speech_rate(clips)._jdf.queryExecution()
    plan = qe.executedPlan().toString()
    assert "Python" not in plan and "InPandas" not in plan, plan
    scan = next(
        ln for ln in plan.splitlines() if "ReadSchema" in ln
    )
    assert "transcript" in scan and "dur_ms" in scan
    assert "bytes" not in scan, scan


def test_vad_run_length_fold(spark):
    """Crafted frame-energy patterns pin the run-length fold: the
    longest consecutive active stretch, not total count."""
    thr = RMS_SILENCE
    hi, lo = thr + 10.0, thr - 10.0
    cases = {
        # pattern -> (n_active, longest_run)
        "all_hi": ([hi] * 8, 8, 8),
        "all_lo": ([lo] * 8, 0, 0),
        "split": ([hi, hi, lo, hi, hi, hi, lo, hi], 6, 3),
        "edge": ([lo, lo, lo, lo, hi, hi, hi, hi], 4, 4),
        "alternating": ([hi, lo] * 4, 4, 1),
        "boundary": ([thr] * 8, 8, 8),  # >= is inclusive
    }
    # drive the REAL operator end-to-end: craft PCM whose 8 equal
    # frames have the desired per-frame RMS (constant amplitude a
    # gives frame RMS exactly a)
    from ungoliant_spark.sources.audio import encode
    import numpy as np

    # craft PCM whose 8 equal frames have the desired per-frame RMS:
    # constant amplitude a gives frame RMS = a
    sr = 8000
    frame_n = sr // 8  # 1 s clip, 8 frames of 1000 samples
    rows = []
    for name, (pattern, _, _) in cases.items():
        pcm = np.concatenate(
            [np.full(frame_n, int(v), dtype="<i2") for v in pattern]
        )
        rows.append((name, encode(pcm, sr, "pcm_s16le"), "pcm_s16le",
                     sr, 1000))
    df = spark.createDataFrame(
        rows,
        "clip_id string, bytes binary, codec string, sr_hz int, "
        "dur_ms int",
    )
    got = {r["clip_id"]: r for r in audio_vad(df).collect()}
    for name, (_, n_active, longest) in cases.items():
        r = got[name]
        assert r["decode_ok"], name
        assert r["n_active"] == n_active, (name, r)
        assert r["longest_run"] == longest, (name, r)
        assert r["active_ratio"] == round(n_active / N_FRAMES, 3)


def test_vad_single_python_pass(spark, fx_dir):
    """audio_vad rides the shared decode: exactly one Arrow node in
    the plan, everything after it JVM-side."""
    clips = spark.read.parquet(f"{fx_dir}/clips.parquet")
    plan = (
        audio_vad(clips)._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("ArrowEvalPython") + plan.count("MapInPandas") == 1, plan
    assert plan.count("BatchEvalPython") == 0


def test_vad_undecodable_null_signals(spark):
    df = spark.createDataFrame(
        [("bad", b"\x00\x01", "opus", 16000, 100)],
        "clip_id string, bytes binary, codec string, sr_hz int, "
        "dur_ms int",
    )
    r = audio_vad(df).collect()[0]
    assert not r["decode_ok"]
    assert r["n_active"] is None
    assert r["active_ratio"] is None
    assert r["longest_run"] is None
