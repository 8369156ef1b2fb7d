"""Structured Streaming surface of the engine.

Three streaming capabilities (SURVEY.md §2.9 notes the reference has
none — resumability there is file-level idempotence; here the same
quality-filter DAG runs incrementally with exactly-once sinks):

* ``stream_quality_filter`` — the full clips pipeline as a streaming
  job: file-source micro-batches → decide() (all stages are
  stateless per-row, so the whole DAG is streaming-compatible) →
  partitioned parquet sink with checkpointing. Restart-safe via the
  sink/checkpoint pair, complementing the batch snapshot tables.
* ``stream_events_hourly`` — watermarked windowed aggregation with
  late-data tolerance (the batch twin is q_events_hourly, which the
  test compares against).
* ``sessionize_events`` — custom stateful operator via
  ``applyInPandasWithState``: per-user sessions closed after a gap
  timeout — state the built-in operators can't express.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ungoliant_spark.plans.pipeline import decide

CLIPS_SCHEMA_DDL = (
    "clip_id string, bytes binary, sr_hz int, dur_ms int, "
    "codec string, transcript string, case_class string"
)


def stream_quality_filter(
    spark: SparkSession,
    clips_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    term_to_category: dict[str, str] | None = None,
    max_files_per_trigger: int = 1,
):
    """Returns the started StreamingQuery writing kept rows."""
    src = (
        spark.readStream.schema(CLIPS_SCHEMA_DDL)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(clips_dir)
    )
    decided = decide(src, term_to_category)
    kept = decided.filter(F.col("keep")).select(
        "clip_id",
        "bytes",
        "sr_hz",
        "dur_ms",
        "codec",
        F.col("scrubbed").alias("transcript"),
        "lang",
        "lang_prob",
        "quality_warnings",
        "categories",
        "line_start",
        "line_end",
        "lang_bucket",
    )
    return (
        kept.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .partitionBy("lang_bucket")
        .outputMode("append")
        .start()
    )


def stream_events_hourly(
    spark: SparkSession,
    events_dir: str,
    watermark: str = "2 hours",
    max_files_per_trigger: int = 4,
) -> DataFrame:
    """Watermarked hourly windowed aggregation (un-started stream)."""
    src = (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, "
            "event_type string, value double, props string"
        )
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(events_dir)
    )
    return (
        src.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour"), F.col("event_type"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("hour"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("end_us", T.LongType()),
        T.StructField("n", T.LongType()),
        T.StructField("s", T.DoubleType()),
    ]
)

SESSION_GAP_US = 30 * 60 * 1_000_000


def _sessionize_group(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
    set_event_timeout: bool = False,
):
    """Emit closed sessions; keep the open one in state. Sessions
    close when a 30-minute event gap is observed (or, with
    ``set_event_timeout``, when the event-time watermark passes the
    open session's end + gap — the production idle-close path)."""
    (user_id,) = key
    if state.hasTimedOut:
        if state.exists:
            start_us, end_us, n, s = state.get
            state.remove()
            yield pd.DataFrame(
                [
                    {
                        "user_id": user_id,
                        "session_start": pd.Timestamp(start_us, unit="us"),
                        "session_end": pd.Timestamp(end_us, unit="us"),
                        "n_events": n,
                        "sum_value": s,
                    }
                ]
            )
        return
    # (ts, event_id): bare ts would leave tied timestamps in shuffle
    # arrival order — nondeterministic across runs/partitionings; the
    # batch twin (q_events_sessions) orders by the same pair. Empty
    # chunks are dropped pre-concat (pandas deprecates concat dtype
    # inference over empty frames).
    chunks = [p for p in pdfs if len(p)]
    if not chunks:
        return
    rows = pd.concat(chunks).sort_values(["ts", "event_id"])
    if state.exists:
        start_us, end_us, n, s = state.get
    else:
        start_us = end_us = None
        n, s = 0, 0.0
    closed = []
    for ts, value in zip(rows["ts"], rows["value"]):
        # microsecond precision: the source timestamps carry sub-ms
        # digits and the batch twin (q_events_sessions) keeps them
        t_us = int(pd.Timestamp(ts).value // 1_000)
        if start_us is None:
            start_us, end_us, n, s = t_us, t_us, 1, float(value)
        elif t_us - end_us > SESSION_GAP_US:
            closed.append((start_us, end_us, n, s))
            start_us, end_us, n, s = t_us, t_us, 1, float(value)
        else:
            end_us = max(end_us, t_us)
            n += 1
            s += float(value)
    state.update((start_us, end_us, n, s))
    if set_event_timeout:
        # close the open session once event time (the watermark)
        # passes its end + gap. The timeout timestamp must be beyond
        # the current watermark or Spark rejects it — a group whose
        # last event is already watermark-stale times out at the next
        # possible instant instead.
        timeout_ms = end_us // 1000 + SESSION_GAP_US // 1000
        state.setTimeoutTimestamp(
            max(timeout_ms, state.getCurrentWatermarkMs() + 1)
        )
    if closed:
        yield pd.DataFrame(
            [
                {
                    "user_id": user_id,
                    "session_start": pd.Timestamp(a, unit="us"),
                    "session_end": pd.Timestamp(b, unit="us"),
                    "n_events": nn,
                    "sum_value": ss,
                }
                for a, b, nn, ss in closed
            ]
        )


def sessionize_events(
    spark: SparkSession,
    events_dir: str,
    max_files_per_trigger: int = 4,
    event_time_timeout: bool = False,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Custom stateful sessionization stream (un-started).

    Two closing modes:

    * default (NoTimeout): sessions close only on an observed 30-min
      gap; the final open session stays in state. Right for bounded
      replays (the driver query force-closes trailing sessions with a
      sentinel flush event) and for tests, where a timer-driven
      variant would make processAllAvailable spin forever.
    * ``event_time_timeout=True`` (production): the stream is
      watermarked on ``ts`` and each open session arms an
      EventTimeTimeout at session_end + gap — idle sessions are
      emitted as event time advances, with no sentinel traffic and no
      unbounded state for users that never return. Late events beyond
      ``watermark`` may land after their session closed (standard
      watermark semantics)."""
    src = (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, "
            "event_type string, value double, props string"
        )
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(events_dir)
    )
    if event_time_timeout:
        return (
            src.withWatermark("ts", watermark)
            .groupBy("user_id")
            .applyInPandasWithState(
                lambda key, pdfs, state: _sessionize_group(
                    key, pdfs, state, set_event_timeout=True
                ),
                outputStructType=SESSION_SCHEMA,
                stateStructType=_STATE_SCHEMA,
                outputMode="append",
                timeoutConf=GroupStateTimeout.EventTimeTimeout,
            )
        )
    return src.groupBy("user_id").applyInPandasWithState(
        _sessionize_group,
        outputStructType=SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_exact_dedup(
    spark: SparkSession,
    clips_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    watermark_delay: str = "1 hour",
    ts_col: str = "ingest_ts",
    max_files_per_trigger: int = 1,
    schema_ddl: str | None = None,
    text_col: str = "transcript",
    available_now: bool = False,
):
    """Streaming exact dedup on ingest — the first copy of each
    normalized ``text_col`` passes, later copies are dropped across
    micro-batches. Built on ``dropDuplicatesWithinWatermark``: state
    holds one (fingerprint) entry per distinct text seen inside
    the watermark horizon and is EVICTED as event time advances —
    bounded state, unlike a plain ``dropDuplicates`` whose state
    grows forever on an unbounded stream. A duplicate arriving after
    the horizon re-admits (the batch ``exact_dedup_reps`` pass
    catches those; this operator is the cheap online guard that stops
    same-day recrawl storms from flooding downstream).

    The input schema defaults to the clips table (``schema_ddl``
    overrides — any table with a text column works) plus an
    event-time ``ts_col`` timestamp (ingest time). Restart-safe via
    the checkpoint; the fingerprint is the same portable hash64 the
    batch dedup family uses."""
    from ungoliant_spark.operators.dedup import hash64, normalize_text

    src = (
        spark.readStream.schema(
            (schema_ddl or CLIPS_SCHEMA_DDL) + f", {ts_col} timestamp"
        )
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(clips_dir)
    )
    deduped = (
        src.withColumn(
            "fingerprint", hash64(normalize_text(F.col(text_col)))
        )
        .withWatermark(ts_col, watermark_delay)
        .dropDuplicatesWithinWatermark(["fingerprint"])
    )
    writer = (
        deduped.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_audio_dedup(
    spark: SparkSession,
    clips_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    watermark_delay: str = "1 hour",
    ts_col: str = "ingest_ts",
    max_files_per_trigger: int = 1,
    available_now: bool = False,
):
    """Streaming ACOUSTIC dedup on ingest — the audio twin of
    :func:`stream_exact_dedup` and the online half of the acoustic
    dedup story: the first clip carrying each 63-bit acoustic
    fingerprint (``afp63``, the same word the batch banded-Hamming
    family joins on) passes; later re-uploads of the SAME AUDIO are
    dropped across micro-batches even when their bytes differ — raw
    PCM and a RIFF/WAVE container of identical samples fingerprint
    identically (pinned by test_audio_codecs_agree), which byte-level
    dedup cannot see.

    Exact-afp only, by design: near-duplicate suppression
    (gain-scaled / re-noised copies at Hamming ≤ 3) requires the
    banded candidate JOIN, which bounded streaming state cannot
    express — that remains the batch pass (audio_dup_components).
    This operator is the cheap online guard that stops re-upload
    storms at ingest; the batch pass sweeps what slips through.

    State is one afp entry per distinct fingerprint inside the
    watermark horizon, EVICTED as event time advances
    (``dropDuplicatesWithinWatermark``) — bounded on an unbounded
    stream. A re-upload after the horizon re-admits (same contract as
    the text stream).

    Undecodable clips are NOT silently merged or dropped: the dedup
    key falls back to a per-clip surrogate in negative key space
    (real afp words are non-negative), so every undecodable clip
    passes through for the downstream gate to judge.

    The decode runs inside the stream's single Arrow node (the same
    per-clip ``_stats_one`` kernel the batch gate uses); the full row
    — including ``bytes`` — rides through that node, which is the
    ingest-time cost of deciding on audio content rather than
    metadata."""
    from ungoliant_spark.operators.audio_ops import _stats_one

    src = (
        spark.readStream.schema(
            CLIPS_SCHEMA_DDL + f", {ts_col} timestamp"
        )
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(clips_dir)
    )
    out_t = T.StructType(
        src.schema.fields + [T.StructField("afp", T.LongType())]
    )

    def batches(it):
        for pdf in it:
            afps = []
            for data, codec, sr in zip(
                pdf["bytes"], pdf["codec"], pdf["sr_hz"]
            ):
                d = _stats_one(bytes(data), codec, int(sr))
                afps.append(d["afp"] if d["decode_ok"] else None)
            out = pdf.copy()
            # nullable Int64: a batch mixing decode failures with
            # full-width 63-bit words must not coerce to float64
            # (Arrow int64 safe-cast overflow — see audio_stats)
            out["afp"] = pd.array(afps, dtype="Int64")
            yield out

    fingerprinted = src.mapInPandas(batches, schema=out_t)
    deduped = (
        fingerprinted.withColumn(
            "afp_key",
            # provably-negative surrogate for undecodable clips:
            # shiftrightunsigned halves the hash into [0, 2^63), so
            # the negation cannot overflow — -abs(xxhash64) - 1
            # wrapped to Long.MAX_VALUE when xxhash64 returned
            # Long.MIN_VALUE (abs(MIN) stays negative), landing inside
            # the real non-negative afp key space (ADVICE r7)
            F.coalesce(
                F.col("afp"),
                -F.shiftrightunsigned(F.xxhash64("clip_id"), 1) - F.lit(1),
            ),
        )
        .withWatermark(ts_col, watermark_delay)
        .dropDuplicatesWithinWatermark(["afp_key"])
        .drop("afp_key")
    )
    writer = (
        deduped.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
