"""Streaming surface: the streamed quality filter must produce the
same kept set as the batch pipeline; the watermarked hourly agg must
match its batch twin; sessionization emits plausible sessions."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from ungoliant_spark.plans.pipeline import decide
from ungoliant_spark.sources.fixtures import generate
from ungoliant_spark.streaming.quality_stream import (
    sessionize_events,
    stream_events_hourly,
    stream_quality_filter,
)

ROOT = "/root/repo/.cache/test_stream"


@pytest.fixture(scope="module")
def clips_dir():
    return f"{generate(0.001)}"


@pytest.fixture(scope="module")
def clips_stream_src(clips_dir):
    """The file stream source must be a directory of uniform files."""
    import os

    src = f"{ROOT}/src"
    shutil.rmtree(ROOT, ignore_errors=True)
    os.makedirs(src)
    shutil.copy(f"{clips_dir}/clips.parquet", f"{src}/clips.parquet")
    return src


def test_stream_quality_matches_batch(spark, clips_dir, clips_stream_src):
    q = stream_quality_filter(
        spark,
        clips_stream_src,
        f"{ROOT}/out",
        f"{ROOT}/ckpt",
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    streamed = spark.read.parquet(f"{ROOT}/out")
    batch = decide(
        spark.read.parquet(f"{clips_dir}/clips.parquet")
    ).filter(F.col("keep"))
    s_ids = {r["clip_id"] for r in streamed.select("clip_id").collect()}
    b_ids = {r["clip_id"] for r in batch.select("clip_id").collect()}
    assert s_ids == b_ids
    # restart on the same checkpoint: no new output (exactly-once)
    q2 = stream_quality_filter(
        spark,
        clips_stream_src,
        f"{ROOT}/out",
        f"{ROOT}/ckpt",
    )
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    assert spark.read.parquet(f"{ROOT}/out").count() == len(s_ids)


@pytest.fixture(scope="module")
def events_stream_src():
    import os

    src = f"{ROOT}/events_src"
    os.makedirs(src, exist_ok=True)
    shutil.copy(
        "/root/testdata/sf0.001/events.parquet", f"{src}/events.parquet"
    )
    return src


def test_stream_events_hourly_matches_batch(spark, events_stream_src):
    events_dir = events_stream_src
    agg = stream_events_hourly(spark, events_dir)
    q = (
        agg.writeStream.format("memory")
        .queryName("hourly_test")
        .outputMode("complete")
        .option(
            "checkpointLocation", f"{ROOT}/ckpt_hourly"
        )
        .start()
    )
    try:
        q.processAllAvailable()
        got = spark.sql(
            "select * from hourly_test"
        ).toPandas()
    finally:
        q.stop()
    exp = (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .groupBy(F.date_trunc("hour", "ts").alias("hour"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .toPandas()
    )
    key = lambda df: sorted(
        (str(r.hour), r.event_type, r.n_events, round(r.sum_value, 4))
        for r in df.itertuples()
    )
    assert key(got) == key(exp)


def test_sessionize_events(spark, events_stream_src):
    sess = sessionize_events(spark, events_stream_src)
    q = (
        sess.writeStream.format("memory")
        .queryName("sessions_test")
        .outputMode("append")
        .option("checkpointLocation", f"{ROOT}/ckpt_sess")
        .start()
    )
    try:
        q.processAllAvailable()
        got = spark.sql("select * from sessions_test").toPandas()
    finally:
        q.stop()
    # closed sessions only — every session respects the 30-min gap rule
    assert (got["session_end"] >= got["session_start"]).all()
    assert (got["n_events"] >= 1).all()

    # cross-validate against the batch twin (window-function
    # sessionization, plans/dataset_queries.q_events_sessions): every
    # stream-closed session must appear verbatim in the batch result,
    # and the batch has EXACTLY one extra session per user — the
    # trailing one that never saw a closing gap and stays in state
    from ungoliant_spark.plans.dataset_queries import q_events_sessions

    batch = q_events_sessions(spark, "/root/testdata/sf0.001").toPandas()

    def key(df):
        return {
            (r.user_id, str(r.session_start), str(r.session_end),
             r.n_events, round(r.sum_value, 4))
            for r in df.itertuples()
        }

    streamed, full = key(got), key(batch)
    assert streamed <= full
    open_per_user = batch.groupby("user_id").size() - (
        got.groupby("user_id").size().reindex(
            batch["user_id"].unique(), fill_value=0
        )
    )
    assert (open_per_user == 1).all()
