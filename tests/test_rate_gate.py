"""Opt-in cross-modal speech-rate gate (round-6 verdict item 5):
rate_ok folds into the pipeline keep decision with a
``rate_implausible`` warning, exactly like the audio gate.

The shared fixture's transcripts and durations are drawn
independently (word-salad over 0.2-4 s), so almost every row sits
outside the human-speech band — useless as a plausible background.
This suite therefore CONSTRUCTS its fixture: real sf0.001 clips with
durations re-derived from each transcript's token count to plant
known-plausible rows (4 tok/s) and known-implausible plants (20 and
0.1 tok/s), then scores the gated pipeline against that frozen
labeling exactly (F1 = 1.0) and pins the default-off path bit-stable.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from ungoliant_spark.plans.pipeline import decide, run as pipeline_run
from ungoliant_spark.sources.fixtures import generate

# Java regex \s (Spark split) is the ASCII class — mirror it exactly
# rather than Python's unicode-aware \s
_WS = re.compile("[ \t\n\x0b\f\r]+")


def _n_tokens(transcript: str) -> int:
    return len([t for t in _WS.split(transcript) if t != ""])


def _rate_ok(n_tokens: int, dur_ms: int) -> bool:
    tps = round(n_tokens * 1000.0 / dur_ms, 4)
    return 0.25 <= tps <= 7.5


@pytest.fixture(scope="module")
def planted(spark):
    """(df, expected_rate_ok) — fixture clips with planted rates:
    every 7th clip 20 tok/s (too fast), every 11th 0.1 tok/s (too
    slow), everything else 4 tok/s (plausible)."""
    d = generate(0.001, with_labels=False)
    rows = (
        spark.read.parquet(f"{d}/clips.parquet")
        .limit(300)
        .collect()
    )
    out, expected = [], {}
    for i, r in enumerate(rows):
        row = r.asDict()
        nt = _n_tokens(row["transcript"])
        if nt > 0:
            if i % 7 == 0:
                target = 20.0  # plant: implausibly fast
            elif i % 11 == 0:
                target = 0.1  # plant: implausibly slow
            else:
                target = 4.0  # plausible background
            row["dur_ms"] = max(1, round(nt * 1000.0 / target))
        expected[row["clip_id"]] = _rate_ok(nt, row["dur_ms"])
        out.append(row)
    df = spark.createDataFrame(out, spark.read.parquet(
        f"{d}/clips.parquet").schema)
    assert 20 < sum(not v for v in expected.values()) < len(expected)
    return df, expected


def test_rate_gate_f1_against_planted_labels(spark, planted):
    """Gated keep == ungated keep AND the planted rate labeling, for
    every row (exact match — F1 = 1.0 by construction), and the
    warning string lands exactly on the rate-failing rows."""
    df, expected = planted
    base = {
        r["clip_id"]: r["keep"]
        for r in decide(df).select("clip_id", "keep").collect()
    }
    gated = {
        r["clip_id"]: r
        for r in decide(df, rate_gate=True)
        .select("clip_id", "keep", "rate_ok", "quality_warnings")
        .collect()
    }
    assert set(gated) == set(base)
    for cid, r in gated.items():
        assert r["rate_ok"] == expected[cid], cid
        assert r["keep"] == (base[cid] and expected[cid]), cid
        assert (
            ("rate_implausible" in r["quality_warnings"])
            == (not expected[cid])
        ), cid
    # the gate actually bit: some base-kept rows were dropped
    dropped = [c for c in base if base[c] and not gated[c]["keep"]]
    assert dropped


def test_rate_gate_production_run_parity(spark, planted):
    """run(rate_gate=True) keeps exactly decide(rate_gate=True)'s keep
    set, and its warnings column carries rate strings nowhere (kept
    rows all passed); default-off run is bit-stable (no rate column,
    same rows)."""
    df, expected = planted
    dec_keep = {
        r["clip_id"]
        for r in decide(df, rate_gate=True)
        .filter("keep").select("clip_id").collect()
    }
    run_gated = pipeline_run(df, rate_gate=True)
    assert "rate_ok" not in run_gated.columns
    got = {r["clip_id"] for r in run_gated.select("clip_id").collect()}
    assert got == dec_keep
    # default-off: identical clip set to the ungated decide
    base_keep = {
        r["clip_id"]
        for r in decide(df).filter("keep").select("clip_id").collect()
    }
    got_base = {
        r["clip_id"]
        for r in pipeline_run(df).select("clip_id").collect()
    }
    assert got_base == base_keep
    assert dec_keep < base_keep  # strictly smaller: plants dropped


def test_rate_gate_plan_stays_catalyst(spark, planted):
    """The gate adds NO Python stage and NO join: same single
    ArrowEvalPython node count as the ungated plan."""
    df, _ = planted

    def n_python(plan: str) -> int:
        return plan.count("ArrowEvalPython") + plan.count("MapInPandas")

    base_plan = (
        pipeline_run(df)._jdf.queryExecution().executedPlan().toString()
    )
    gated_plan = (
        pipeline_run(df, rate_gate=True)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert n_python(gated_plan) == n_python(base_plan)
    assert gated_plan.count("Join") == base_plan.count("Join")
