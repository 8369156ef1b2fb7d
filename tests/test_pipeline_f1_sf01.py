"""Scale-tier F1 gate: the full pipeline vs frozen labels at sf0.01
(20k clips — the driver's correctness tier). Catches anything
partition-count- or batch-boundary-dependent that the 2k-row tier
might miss."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from ungoliant_spark.plans.pipeline import decide
from ungoliant_spark.sources.fixtures import fixture_dir

LABELS = os.path.join(fixture_dir(0.01), "labels.parquet")
CLIPS = os.path.join(fixture_dir(0.01), "clips.parquet")

pytestmark = pytest.mark.skipif(
    not os.path.exists(LABELS),
    reason="sf0.01 labels not generated (run fixtures.generate(0.01))",
)


def test_keep_f1_sf01(spark):
    clips = spark.read.parquet(CLIPS)
    labels = spark.read.parquet(LABELS)
    dec = decide(clips).select("clip_id", "keep", "lang")
    j = dec.join(
        labels.select(
            "clip_id",
            F.col("keep").alias("exp_keep"),
            F.col("lang").alias("exp_lang"),
        ),
        "clip_id",
    )
    counts = (
        j.groupBy("keep", "exp_keep").count().collect()
    )
    tp = fp = fn = tn = 0
    for r in counts:
        if r["keep"] and r["exp_keep"]:
            tp = r["count"]
        elif r["keep"] and not r["exp_keep"]:
            fp = r["count"]
        elif not r["keep"] and r["exp_keep"]:
            fn = r["count"]
        else:
            tn = r["count"]
    precision = tp / (tp + fp) if tp + fp else 1.0
    recall = tp / (tp + fn) if tp + fn else 1.0
    f1 = 2 * precision * recall / (precision + recall)
    assert f1 >= 0.99, (f1, {"tp": tp, "fp": fp, "fn": fn, "tn": tn})
    lang_mismatch = j.filter(
        F.col("keep") & F.col("exp_keep") & (F.col("lang") != F.col("exp_lang"))
    ).count()
    assert lang_mismatch == 0
