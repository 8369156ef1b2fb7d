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



def test_sessionize_event_time_timeout(spark, tmp_path):
    """Production session closing (round-3 verdict item 5): an idle
    session must be emitted when the event-time WATERMARK passes its
    end + gap — no observed gap event for that user, no sentinel
    flush. User 1's events arrive in micro-batch 1 and nothing ever
    again; user 2's much-later event in micro-batch 2 advances the
    watermark, which alone closes user 1's session (Spark runs a
    no-data micro-batch to fire the timeout)."""
    import glob
    import os
    import shutil
    import time

    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    sch = ("event_id long, ts string, user_id long, "
           "event_type string, value double, props string")
    out_sch = ("user_id long, session_start timestamp, session_end "
               "timestamp, n_events long, sum_value double")

    def drop(rows, name):  # the file source wants plain files
        stage = str(tmp_path / f"stage_{name}")
        (
            spark.createDataFrame(rows, sch)
            .withColumn("ts", F.col("ts").cast("timestamp"))
            .coalesce(1).write.parquet(stage)
        )
        shutil.copy(glob.glob(f"{stage}/part-*.parquet")[0],
                    f"{src}/{name}.parquet")

    drop([(1, "2026-01-01 00:00:00", 1, "a", 1.0, ""),
          (2, "2026-01-01 00:05:00", 1, "a", 2.0, "")], "b1")
    sess = sessionize_events(
        spark, src, max_files_per_trigger=1, event_time_timeout=True,
        watermark="10 minutes",
    )
    q = (
        sess.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        # nothing closed yet: watermark is only at 00:05 − 10 min
        assert spark.read.schema(out_sch).parquet(sink).count() == 0
        drop([(3, "2026-01-01 03:00:00", 2, "a", 5.0, "")], "b2")
        q.processAllAvailable()
        deadline = time.time() + 30
        rows = []
        while time.time() < deadline and not rows:
            rows = spark.read.schema(out_sch).parquet(sink).collect()
            rows or time.sleep(0.5)
    finally:
        q.stop()
    assert len(rows) == 1, rows
    r = rows[0]
    assert r["user_id"] == 1 and r["n_events"] == 2
    assert r["sum_value"] == 3.0
    assert str(r["session_start"]).startswith("2026-01-01 00:00:00")
    assert str(r["session_end"]).startswith("2026-01-01 00:05:00")


def test_stream_exact_dedup(spark, clips_dir, tmp_path):
    """Streaming dedup drops repeated transcripts ACROSS micro-batches
    (state persists between files) while keeping exactly one copy per
    distinct fingerprint; state is watermark-bounded by construction
    (dropDuplicatesWithinWatermark)."""
    import os

    from ungoliant_spark.operators.dedup import hash64, normalize_text
    from ungoliant_spark.streaming.quality_stream import (
        stream_exact_dedup,
    )

    src = str(tmp_path / "src")
    os.makedirs(src)
    base = (
        spark.read.parquet(f"{clips_dir}/clips.parquet")
        .limit(40)
        .withColumn("ingest_ts", F.lit("2026-01-01 00:00:00").cast("timestamp"))
    )
    base.coalesce(1).write.parquet(f"{src}/batch1")
    # second file: 10 exact duplicates under new clip_ids, 5 fresh-ish
    dup = (
        base.limit(10)
        .withColumn("clip_id", F.concat(F.lit("dup-"), "clip_id"))
        .withColumn(
            "ingest_ts", F.lit("2026-01-01 00:10:00").cast("timestamp")
        )
    )
    dup.coalesce(1).write.parquet(f"{src}/batch2")
    # file source wants uniform files in ONE dir
    flat = str(tmp_path / "flat")
    os.makedirs(flat)
    i = 0
    for sub in ("batch1", "batch2"):
        for f in os.listdir(f"{src}/{sub}"):
            if f.endswith(".parquet"):
                os.rename(f"{src}/{sub}/{f}", f"{flat}/part-{i}.parquet")
                i += 1
    q = stream_exact_dedup(
        spark, flat, str(tmp_path / "out"), str(tmp_path / "ckpt")
    )
    q.processAllAvailable()
    q.stop()
    out = spark.read.parquet(str(tmp_path / "out"))
    inp = spark.read.parquet(flat).withColumn(
        "fingerprint", hash64(normalize_text(F.col("transcript")))
    )
    n_distinct = inp.select("fingerprint").distinct().count()
    assert out.count() == n_distinct
    assert out.select("fingerprint").distinct().count() == n_distinct
    # every duplicate transcript kept exactly one clip
    per_fp = out.groupBy("fingerprint").count()
    assert per_fp.filter(F.col("count") != 1).count() == 0


def test_stream_dedup_readmits_after_horizon(spark, tmp_path):
    """Watermark-bounded state semantics, pinned deterministically:
    a duplicate INSIDE the horizon is dropped; once the event-time
    watermark passes first_ts + delay the fingerprint's state is
    evicted and a later copy RE-ADMITS (the property that makes the
    state bounded on an unbounded stream). One file per micro-batch
    (utime-ordered, maxFilesPerTrigger=1) so watermark advancement
    between batches is exact."""
    import os

    from ungoliant_spark.streaming.quality_stream import (
        stream_exact_dedup,
    )

    src = str(tmp_path / "src")
    os.makedirs(src)
    t0 = "2026-01-01 00:00:00"
    schema = "doc_id long, source string, text string"

    def write_wave(i, rows):
        df = spark.createDataFrame(
            [(d, "s", t) for d, t in rows], schema
        ).withColumn(
            "ingest_ts",
            F.to_timestamp(F.lit(t0)) + F.make_interval(
                secs=F.col("doc_id") * 60
            ),
        )
        stage = str(tmp_path / f"stage{i}")
        df.coalesce(1).write.parquet(stage)
        part = next(f for f in os.listdir(stage) if f.endswith(".parquet"))
        dst = f"{src}/wave-{i}.parquet"
        os.rename(f"{stage}/{part}", dst)
        os.utime(dst, (1_700_000_000 + 10 * i, 1_700_000_000 + 10 * i))

    # doc_id encodes minutes-after-t0. delay = 1 hour.
    # wave 1: first copy of "x" at t0, plus "z" at t0
    write_wave(1, [(0, "x"), (1, "z")])
    # wave 2: duplicate of "x" at +30 min (state alive -> DROPPED);
    # "q" at +180 min advances the watermark to +120 min, evicting
    # "x" (expiry = 0 + 60 min) at batch end
    write_wave(2, [(30, "x"), (180, "q")])
    # wave 3: "w" advances the batch whose state cleanup (which runs
    # AFTER input processing, hence the separate batch) drops "x"
    write_wave(3, [(190, "w")])
    # wave 4: duplicate of "x" at +195 min -> state gone, RE-ADMITTED
    write_wave(4, [(195, "x")])

    q = stream_exact_dedup(
        spark,
        src,
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
        watermark_delay="1 hour",
        schema_ddl=schema,
        text_col="text",
        available_now=True,
    )
    q.awaitTermination()
    out = spark.read.parquet(str(tmp_path / "out"))
    got = sorted(r["doc_id"] for r in out.select("doc_id").collect())
    # 0 ("x" first copy), 1 ("z"), 180 ("q"), 190 ("w"), 195 ("x"
    # re-admitted); 30 (in-horizon duplicate) dropped
    assert got == [0, 1, 180, 190, 195]


def test_stream_audio_dedup(spark, tmp_path):
    """Streaming acoustic dedup drops re-uploads of the SAME AUDIO
    across micro-batches — including a re-upload re-encoded into the
    other container (raw PCM vs RIFF/WAVE of identical samples have
    equal afp words, which byte-level dedup cannot see) — while
    undecodable clips pass through one-per-clip (surrogate key, never
    merged on the null fingerprint)."""
    import os

    import numpy as np

    from ungoliant_spark.sources.audio import encode, synth_pcm
    from ungoliant_spark.streaming.quality_stream import (
        stream_audio_dedup,
    )

    def clip(i, codec, sr=16000, dur=300):
        pcm = synth_pcm(np.random.default_rng(1000 + i), sr, dur)
        return pcm, encode(pcm, sr, codec)

    from datetime import datetime

    t1 = datetime(2026, 1, 1, 0, 0, 0)
    t2 = datetime(2026, 1, 1, 0, 10, 0)
    schema = (
        "clip_id string, bytes binary, sr_hz int, dur_ms int, "
        "codec string, transcript string, case_class string, "
        "ingest_ts timestamp"
    )
    base = []
    pcms = {}
    for i in range(12):
        codec = "pcm_s16le" if i % 2 == 0 else "wav"
        pcm, data = clip(i, codec)
        pcms[i] = (pcm, codec)
        base.append(
            (f"c{i:02d}", bytearray(data), 16000, 300, codec, f"t{i}", "ok", t1)
        )
    # batch 2: one exact byte re-upload, one re-encoded into the OTHER
    # container, two undecodable clips, one genuinely fresh clip
    reup = (
        "reup-0", base[0][1], 16000, 300, "pcm_s16le", "re", "dup", t2
    )
    other = "wav" if pcms[1][1] == "pcm_s16le" else "pcm_s16le"
    reenc = (
        "reenc-1",
        bytearray(encode(pcms[1][0], 16000, other)),
        16000, 300, other, "re", "dup", t2,
    )
    bad = [
        (f"bad-{k}", bytearray(b"xx"), 16000, 300, "opus", "b", "bad", t2)
        for k in range(2)
    ]
    _, fresh_data = clip(99, "wav")
    fresh = ("fresh-0", bytearray(fresh_data), 16000, 300, "wav", "f", "ok", t2)

    from pyspark.sql import functions as F  # noqa: F401

    flat = str(tmp_path / "flat")
    os.makedirs(flat)
    for n, rows in enumerate([base, [reup, reenc, *bad, fresh]]):
        d = str(tmp_path / f"b{n}")
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(d)
        for f in os.listdir(d):
            if f.endswith(".parquet"):
                dst = f"{flat}/part-{n}.parquet"
                os.rename(f"{d}/{f}", dst)
                os.utime(dst, (1700000000 + n, 1700000000 + n))

    q = stream_audio_dedup(
        spark, flat, str(tmp_path / "out"), str(tmp_path / "ckpt")
    )
    q.processAllAvailable()
    q.stop()
    out = spark.read.parquet(str(tmp_path / "out"))
    ids = {r.clip_id for r in out.select("clip_id").collect()}
    assert ids == {f"c{i:02d}" for i in range(12)} | {
        "bad-0",
        "bad-1",
        "fresh-0",
    }
    # undecodable rows carry a null fingerprint but BOTH survive
    assert out.filter("afp is null").count() == 2


def test_stream_audio_dedup_state_survives_restart(spark, tmp_path):
    """The restart-safety claim, pinned end-to-end: a SECOND query
    started from the same checkpoint (1) does not re-emit the files
    the first run committed (exactly-once source progress) and
    (2) RESTORES the dedup state — a re-upload arriving only after
    the restart is still dropped against a fingerprint first seen
    before it."""
    import os
    from datetime import datetime

    import numpy as np

    from ungoliant_spark.sources.audio import encode, synth_pcm
    from ungoliant_spark.streaming.quality_stream import (
        stream_audio_dedup,
    )

    schema = (
        "clip_id string, bytes binary, sr_hz int, dur_ms int, "
        "codec string, transcript string, case_class string, "
        "ingest_ts timestamp"
    )
    src = str(tmp_path / "src")
    os.makedirs(src)

    def write_file(n, rows):
        stage = str(tmp_path / f"stage{n}")
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(stage)
        part = next(f for f in os.listdir(stage) if f.endswith(".parquet"))
        dst = f"{src}/wave-{n}.parquet"
        os.rename(f"{stage}/{part}", dst)
        os.utime(dst, (1_700_000_000 + 10 * n,) * 2)

    def clip(i, cid, ts):
        pcm = synth_pcm(np.random.default_rng(400 + i), 16000, 250)
        return (
            cid, bytearray(encode(pcm, 16000, "pcm_s16le")), 16000, 250,
            "pcm_s16le", f"t{i}", "ok", ts,
        )

    t1, t2 = datetime(2026, 1, 1, 0, 0, 0), datetime(2026, 1, 1, 0, 5, 0)
    first = [clip(i, f"c{i}", t1) for i in range(4)]
    write_file(1, first)

    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q1 = stream_audio_dedup(spark, src, out, ckpt, available_now=True)
    q1.awaitTermination()
    assert spark.read.parquet(out).count() == 4

    # AFTER the first query finished: a byte-identical re-upload of c0
    # (same afp, inside the 1 h horizon) plus one fresh clip
    write_file(2, [
        ("dup-c0", first[0][1], 16000, 250, "pcm_s16le", "re", "dup", t2),
        clip(9, "c9", t2),
    ])
    q2 = stream_audio_dedup(spark, src, out, ckpt, available_now=True)
    q2.awaitTermination()

    rows = spark.read.parquet(out).groupBy("clip_id").count().collect()
    counts = {r.clip_id: r["count"] for r in rows}
    # no re-emits of wave-1, the restored state drops the re-upload,
    # the fresh clip lands
    assert counts == {"c0": 1, "c1": 1, "c2": 1, "c3": 1, "c9": 1}
