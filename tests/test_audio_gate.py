"""Audio-side quality gate as a first-class pipeline decision
(round-5 verdict item 4): with audio_gate=True the kept set equals
transcript-keep AND independently-recomputed audio_keep — exact set
match (F1 = 1.0) against ground truth built from the independent
RIFF-walk decode path, including the fixture's planted silent /
clipped / dead-air clips (sources/fixtures.py AUDIO_ANOMALY_PERIOD).
Drop reasons surface in quality_warnings on the decisions table."""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from ungoliant_spark.operators.audio_ops import (
    CLIP_PEAK,
    MAX_SILENCE_RATIO,
    RMS_SILENCE,
)
from ungoliant_spark.plans.pipeline import decide
from ungoliant_spark.plans.pipeline import run as pipeline_run
from ungoliant_spark.sources.fixtures import (
    ADULT_CATEGORY,
    ADULT_TERMS,
    AUDIO_ANOMALY_PERIOD,
    generate,
)

TERM_MAP = {t: ADULT_CATEGORY for t in ADULT_TERMS}
SF = 0.001


@pytest.fixture(scope="module")
def fx_dir():
    return generate(SF)


def _expected_audio_keep() -> dict[str, bool]:
    """Ground truth from the INDEPENDENT decode path (struct-based
    RIFF walk in oracle_sql_clips), not the engine's wave-module
    decoder — the same independence discipline as the audio_quality
    driver oracle."""
    from ungoliant_spark.oracle_sql_clips import ensure_audio_expected

    tbl = pq.read_table(
        ensure_audio_expected(SF),
        columns=["clip_id", "decode_ok", "rms", "peak", "frame_energy"],
    ).to_pylist()
    out = {}
    for r in tbl:
        if not r["decode_ok"]:
            out[r["clip_id"]] = False
            continue
        silent = sum(1 for e in r["frame_energy"] if e < RMS_SILENCE)
        ratio = round(silent / len(r["frame_energy"]), 3)
        out[r["clip_id"]] = (
            r["rms"] >= RMS_SILENCE
            and r["peak"] < CLIP_PEAK
            and ratio <= MAX_SILENCE_RATIO
        )
    return out


def test_gated_kept_set_exact(spark, fx_dir):
    clips = spark.read.parquet(f"{fx_dir}/clips.parquet")
    labels = {
        r["clip_id"]: r["keep"]
        for r in spark.read.parquet(f"{fx_dir}/labels.parquet").collect()
    }
    audio_keep = _expected_audio_keep()
    expected = {
        cid for cid, k in labels.items() if k and audio_keep[cid]
    }
    got = {
        r["clip_id"]
        for r in pipeline_run(clips, TERM_MAP, audio_gate=True)
        .select("clip_id")
        .collect()
    }
    assert got == expected  # F1 = 1.0, clip-by-clip
    # the planted anomalies really exercised the gate: at least one
    # transcript-kept clip of each anomaly class was audio-dropped
    dropped_by_audio = {
        cid for cid, k in labels.items() if k and not audio_keep[cid]
    }
    planted_mods = {
        int(cid.split("-")[1]) % AUDIO_ANOMALY_PERIOD
        for cid in dropped_by_audio
    }
    assert {1, 2, 3} <= planted_mods
    assert dropped_by_audio and dropped_by_audio.isdisjoint(got)


def test_gate_default_off_unchanged(spark, fx_dir):
    """audio_gate defaults off: the kept set is exactly the
    transcript-side decision (clips_kept driver row stays bit-stable)."""
    clips = spark.read.parquet(f"{fx_dir}/clips.parquet")
    base = {
        r["clip_id"]
        for r in pipeline_run(clips, TERM_MAP).select("clip_id").collect()
    }
    labels = {
        r["clip_id"]: r["keep"]
        for r in spark.read.parquet(f"{fx_dir}/labels.parquet").collect()
    }
    assert base == {cid for cid, k in labels.items() if k}


def test_decide_audio_gate_lineage(spark, fx_dir):
    """decide(audio_gate=True): decisions stay total (one row per
    clip), keep folds in audio_keep, and audio drop REASONS land in
    quality_warnings for the planted anomalies."""
    clips = spark.read.parquet(f"{fx_dir}/clips.parquet")
    df = decide(clips, TERM_MAP, audio_gate=True)
    rows = {
        r["clip_id"]: r
        for r in df.select(
            "clip_id", "keep", "audio_keep", "quality_warnings"
        ).collect()
    }
    assert len(rows) == clips.count()
    audio_keep = _expected_audio_keep()
    reasons = {
        1: "audio_too_quiet",
        2: "audio_clipped",
        3: "audio_mostly_silent",
    }
    n_checked = 0
    for cid, r in rows.items():
        i = int(cid.split("-")[1])
        assert r["audio_keep"] == audio_keep[cid], cid
        k = i % AUDIO_ANOMALY_PERIOD
        if k in reasons and not audio_keep[cid]:
            assert reasons[k] in (r["quality_warnings"] or []), (
                cid, r["quality_warnings"]
            )
            assert not r["keep"]
            n_checked += 1
    assert n_checked > 0
