"""End-to-end pipeline vs the frozen reference labels (BASELINE.json):
keep/drop F1 ≥ 0.99, scrubbed-transcript exact match, language match,
bytes passthrough (plan-level + decoded SNR ≥ 30 dB)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from ungoliant_spark.plans.pipeline import decide, kept_output
from ungoliant_spark.sources.audio import decode, snr_db, synth_pcm
from ungoliant_spark.sources.fixtures import (
    ADULT_CATEGORY,
    ADULT_TERMS,
    SEED,
    generate,
)

TERM_MAP = {t: ADULT_CATEGORY for t in ADULT_TERMS}


@pytest.fixture(scope="module")
def fixture_dir():
    return generate(0.001)


@pytest.fixture(scope="module")
def decided(spark, fixture_dir):
    clips = spark.read.parquet(f"{fixture_dir}/clips.parquet")
    df = decide(clips, TERM_MAP)
    cols = [
        "clip_id", "keep", "lang", "lang_prob", "quality_warnings",
        "categories", "scrubbed", "line_start", "line_end",
    ]
    return {r["clip_id"]: r for r in df.select(cols).collect()}


@pytest.fixture(scope="module")
def labels(spark, fixture_dir):
    rows = spark.read.parquet(f"{fixture_dir}/labels.parquet").collect()
    return {r["clip_id"]: r for r in rows}


def test_keep_f1(decided, labels):
    tp = fp = fn = tn = 0
    for cid, lab in labels.items():
        got = decided[cid]["keep"]
        exp = lab["keep"]
        if got and exp:
            tp += 1
        elif got and not exp:
            fp += 1
        elif not got and exp:
            fn += 1
        else:
            tn += 1
    precision = tp / (tp + fp) if tp + fp else 1.0
    recall = tp / (tp + fn) if tp + fn else 1.0
    f1 = 2 * precision * recall / (precision + recall)
    assert f1 >= 0.99, (f1, {"tp": tp, "fp": fp, "fn": fn, "tn": tn})


@pytest.fixture(scope="module")
def kept_rows(spark, fixture_dir):
    from ungoliant_spark.plans.pipeline import run

    clips = spark.read.parquet(f"{fixture_dir}/clips.parquet")
    out = run(clips, TERM_MAP, n_partitions=8)
    return {r["clip_id"]: r for r in out.drop("bytes").collect()}


def test_kept_row_fields_match_labels(kept_rows, labels):
    n_kept_labels = sum(1 for lab in labels.values() if lab["keep"])
    assert len(kept_rows) == n_kept_labels
    for cid, got in kept_rows.items():
        lab = labels[cid]
        assert lab["keep"], cid
        assert got["lang"] == lab["lang"], cid
        assert abs(got["lang_prob"] - lab["lang_prob"]) < 1e-5, cid
        assert got["transcript"] == lab["scrubbed_transcript"], cid
        assert list(got["quality_warnings"]) == list(lab["quality_warnings"]), cid
        got_cats = list(got["categories"]) if got["categories"] else None
        exp_cats = list(lab["categories"]) if lab["categories"] else None
        assert got_cats == exp_cats, cid
        assert got["line_start"] == lab["line_start"], cid
        assert got["line_end"] == lab["line_end"], cid
        assert got["tlsh"] == lab["tlsh"], cid
        if lab["harmful_pp"] is None:
            assert got["harmful_pp"] is None, cid
        else:
            assert got["harmful_pp"] == pytest.approx(
                lab["harmful_pp"], rel=1e-4
            ), cid


def test_fused_matches_modular(spark, fixture_dir):
    """run() (single fused model node) and kept_output(decide(...))
    (modular 3-node composition) must produce identical rows — same
    kernels, different physical plan."""
    from ungoliant_spark.plans.pipeline import run

    clips = spark.read.parquet(f"{fixture_dir}/clips.parquet")
    cols = [
        "clip_id", "lang", "lang_prob", "transcript", "quality_warnings",
        "categories", "harmful_pp", "tlsh", "line_start", "line_end",
        "lang_bucket",
    ]
    fused = {
        r["clip_id"]: r for r in run(clips, TERM_MAP).select(cols).collect()
    }
    modular = {
        r["clip_id"]: r
        for r in kept_output(decide(clips, TERM_MAP)).select(cols).collect()
    }
    assert set(fused) == set(modular)
    for cid, f in fused.items():
        m = modular[cid]
        for c in cols:
            assert f[c] == m[c], (cid, c, f[c], m[c])


def test_run_plan_single_python_node(spark, fixture_dir):
    """The production plan must evaluate exactly ONE ArrowEvalPython
    node: each extra Python node re-spools the full pass-through row
    (incl. multi-KB audio bytes) through a JVM row queue — measured
    ~35 s per node at sf0.1/local[32]."""
    from ungoliant_spark.plans.pipeline import run

    clips = spark.read.parquet(f"{fixture_dir}/clips.parquet")
    plan = run(clips, TERM_MAP, n_partitions=8)._jdf.queryExecution(
    ).executedPlan().toString()
    assert plan.count("ArrowEvalPython") == 1, plan.count("ArrowEvalPython")
    assert plan.count("BatchEvalPython") == 0


def test_bytes_never_enter_python_stage(spark, fixture_dir):
    from ungoliant_spark.plans.pipeline import run

    clips = spark.read.parquet(f"{fixture_dir}/clips.parquet")
    for out in (
        kept_output(decide(clips, TERM_MAP)),
        run(clips, TERM_MAP),
    ):
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "ArrowEvalPython" in plan  # the model stage exists
        for line in plan.splitlines():
            # no Python-boundary node may list the audio column as input
            if "Python" in line or "InPandas" in line:
                assert "bytes#" not in line.split("],")[0], line


def test_pcm_passthrough_snr(spark, fixture_dir):
    clips = spark.read.parquet(f"{fixture_dir}/clips.parquet")
    kept = kept_output(decide(clips, TERM_MAP))
    sample = kept.select("clip_id", "bytes", "sr_hz", "dur_ms", "codec").limit(
        64
    ).collect()
    assert sample
    from ungoliant_spark.sources.fixtures import expected_pcm

    for r in sample:
        i = int(r["clip_id"].split("-")[1])
        expected = expected_pcm(i, r["sr_hz"], r["dur_ms"])
        got = decode(bytes(r["bytes"]), r["codec"])
        assert snr_db(expected, got) >= 30.0, r["clip_id"]
