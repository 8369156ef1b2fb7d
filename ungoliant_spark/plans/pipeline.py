"""The full quality-filter pipeline over a clips table — the Spark
equivalent of OscarDocNew::run (/root/reference/src/pipelines/
oscardoc/pipeline.rs:426-507).

Stage order and the reasoning (SURVEY.md §4 "cheap filters first"):

  scan → trim (Catalyst) → PFilter (Catalyst) → annotators +
  noisy+tiny drop (Catalyst) → LID (pandas UDF) → doc-threshold
  filter → adult categories (Catalyst) → PII scrub (Catalyst) →
  lang_bucket + salted repartition → sinks

The reference runs annotators *after* LID (pipeline.rs:213-226); the
annotations are pure functions of the trimmed content, so hoisting
the noisy+tiny drop above the Python stage changes no decision while
sparing the expensive model pass for doomed rows — the same
discipline the reference itself applies by running trim/PFilter
before fastText. Catalyst cannot reorder predicates across a Python
UDF, so this staging is done by hand here.

The audio ``bytes`` column never enters the Python stage: the UDF
consumes only the ``lines`` array, so ArrowEvalPython ships just that
column to the worker (verified by plan inspection in tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ungoliant_spark.operators.annotators import apply_annotators
from ungoliant_spark.operators.blocklist import apply_blocklist
from ungoliant_spark.operators.lid import apply_lid
from ungoliant_spark.operators.perplexity import apply_perplexity
from ungoliant_spark.operators.pfilter import apply_pfilter
from ungoliant_spark.operators.scrub import apply_scrub
from ungoliant_spark.operators.tlsh_op import apply_tlsh
from ungoliant_spark.operators.trim import apply_trim

# default salt fan-out for the dominant-language skew (FIXTURES.md §3.12:
# ~70% of rows are 'en'); bounds the biggest write partition to
# ~total/SALT_BUCKETS instead of ~total*0.7
DEFAULT_SALT_BUCKETS = 16


def audio_gate_columns(
    clips: DataFrame, extra: tuple[str, ...] = ()
) -> DataFrame:
    """(clip_id, audio_keep, audio_warnings[, *extra]) — the audio-side gate
    (operators/audio_ops.audio_quality: one shared decode pass) with
    its drop reasons rendered as quality_warnings-style strings, so
    the decision surface records WHY a clip's audio failed (the same
    lineage discipline as the transcript annotators; reference
    annotator→drop chain, /root/reference/src/pipelines/oscardoc/
    pipeline.rs:213-226). ``extra`` rides named audio_stats columns
    (afp, frame_energy) along from the same decode pass so the gate's
    decode is never repeated by later dedup/VAD passes."""
    from ungoliant_spark.operators.audio_ops import (
        MAX_SILENCE_RATIO,
        audio_quality,
    )

    aq = audio_quality(clips, extra=extra)
    return aq.select(
        "clip_id",
        "audio_keep",
        *extra,
        F.array_compact(
            F.array(
                F.when(~F.col("decode_ok"), F.lit("audio_undecodable")),
                F.when(F.col("too_quiet"), F.lit("audio_too_quiet")),
                F.when(F.col("clipped"), F.lit("audio_clipped")),
                F.when(
                    F.col("silence_ratio") > MAX_SILENCE_RATIO,
                    F.lit("audio_mostly_silent"),
                ),
            )
        ).alias("audio_warnings"),
    )


def _apply_rate_gate(df: DataFrame) -> DataFrame:
    """Annotate the speech-rate sanity check: rate_ok + the
    ``rate_implausible`` reason in quality_warnings (same lineage
    discipline as the audio gate — a rate drop is auditable from the
    decision surface). Callers fold rate_ok into their keep decision
    (decide: AND into ``keep``; run: filter)."""
    from ungoliant_spark.operators.audio_ops import (
        MAX_TPS,
        MIN_TPS,
        rate_columns,
    )

    _, _, _, ok = rate_columns(MIN_TPS, MAX_TPS)
    # null dur_ms (or 0 → null division) must gate to False, not
    # propagate NULL into the keep decision — same convention as the
    # audio gate's coalesce (ADVICE r7)
    ok = F.coalesce(ok, F.lit(False))
    return df.withColumn("rate_ok", ok).withColumn(
        "quality_warnings",
        F.when(
            F.col("rate_ok"),
            F.col("quality_warnings"),
        ).otherwise(
            F.array_append(
                "quality_warnings", F.lit("rate_implausible")
            )
        ),
    )


def decide(
    df: DataFrame,
    term_to_category: dict[str, str] | None = None,
    prune_before_lid: bool = True,
    audio_gate: bool = False,
    rate_gate: bool = False,
) -> DataFrame:
    """Compute every pipeline decision column for all input rows.

    With ``prune_before_lid`` the LID UDF sees an empty line array for
    rows already dropped by the Catalyst stages (identify_doc([]) is
    O(1)), so the model cost is paid only for heuristic survivors
    while decisions stay defined for every row (needed for F1 scoring
    and lineage of drops).

    With ``audio_gate`` (opt-in; default off keeps the transcript-only
    decision surface bit-stable) the audio-side gate joins in:
    ``keep`` additionally requires ``audio_keep``, and the audio drop
    reasons are appended to ``quality_warnings`` so the lineage of an
    audio-dropped clip is auditable from the decisions table exactly
    like a transcript drop. The join is an equi-join on clip_id of
    two narrow projections of the same scan — the audio branch ships
    only (clip_id, bytes, codec, sr_hz) through its single decode
    pass; ``bytes`` still never enters the transcript-side Python
    stage.

    With ``rate_gate`` (opt-in; default off keeps the decision
    surface bit-stable) the cross-modal speech-rate sanity check
    joins the decision: ``keep`` additionally requires the
    tokens-per-second rate to sit in the plausible human-speech band
    (audio_ops.MIN_TPS..MAX_TPS over the RAW transcript and stored
    duration — a mismatched upload or machine caption check, so it
    runs BEFORE scrubbing), with ``rate_implausible`` appended to
    quality_warnings. Pure Catalyst over two columns already in the
    row — no join, no decode (audio_ops.rate_columns, the same
    kernel as the speech_rate operator). Reference analog: the
    annotator→drop chain, /root/reference/src/pipelines/oscardoc/
    pipeline.rs:213-226.
    """
    df = apply_trim(df)
    df = apply_pfilter(df)
    df = apply_annotators(df)
    heur_keep = (
        F.col("trim_keep") & F.col("pfilter_keep") & F.col("annotation_keep")
    )
    df = df.withColumn("heuristic_keep", heur_keep)
    if prune_before_lid:
        df = df.withColumn(
            "_lid_input",
            F.when(F.col("heuristic_keep"), F.col("lines")).otherwise(
                F.array().cast("array<string>")
            ),
        )
    else:
        df = df.withColumn("_lid_input", F.col("lines"))
    df = apply_lid(df, lines_col="_lid_input")
    df = df.drop("_lid_input")
    df = df.withColumn("keep", F.col("heuristic_keep") & F.col("lid_keep"))
    if audio_gate:
        aq = audio_gate_columns(df)
        df = (
            df.join(aq, "clip_id", "left")
            .withColumn(
                "audio_keep", F.coalesce("audio_keep", F.lit(False))
            )
            .withColumn(
                "quality_warnings",
                F.concat(
                    "quality_warnings",
                    F.coalesce(
                        "audio_warnings",
                        F.array().cast("array<string>"),
                    ),
                ),
            )
            .withColumn("keep", F.col("keep") & F.col("audio_keep"))
            .drop("audio_warnings")
        )
    if rate_gate:
        df = _apply_rate_gate(df).withColumn(
            "keep", F.col("keep") & F.col("rate_ok")
        )
    if term_to_category:
        df = apply_blocklist(df, term_to_category)
    else:
        df = df.withColumn("categories", F.lit(None).cast("array<string>"))
    df = apply_scrub(df)
    df = df.withColumn(
        "scrubbed", F.when(F.col("keep"), F.col("scrubbed"))
    )
    # language bucket for partitioned writes ('multi' and real tags)
    return df.withColumn(
        "lang_bucket", F.when(F.col("keep"), F.col("lang"))
    )


FINAL_COLUMNS = [
    "clip_id",
    "bytes",
    "sr_hz",
    "dur_ms",
    "codec",
    "transcript",
    "lang",
    "lang_prob",
    "sentence_langs",
    "quality_warnings",
    "categories",
    "harmful_pp",
    "tlsh",
    "line_start",
    "line_end",
    "lang_bucket",
]


def kept_output(
    df_decided: DataFrame, n_partitions: int | None = None
) -> DataFrame:
    """Modular composition over decide(): kept rows + standalone TLSH
    and perplexity operators. Produces the same rows/values as
    ``run()`` (tested), but evaluates 3-4 Python nodes — use ``run()``
    for anything that carries the audio ``bytes`` column to a sink
    (each extra Python node re-spools the full row through the JVM
    row queue; see operators/model_stage.py)."""
    kept = df_decided.filter(F.col("keep"))
    kept = apply_tlsh(kept, "content")
    kept = apply_perplexity(kept, "content", "lang_bucket")
    if n_partitions:
        kept = salted_repartition(kept, n_partitions)
    return kept.select(
        *[
            F.col("scrubbed").alias("transcript") if c == "transcript" else c
            for c in FINAL_COLUMNS
        ]
    )


def salted_repartition(
    df: DataFrame, n_partitions: int, salt_buckets: int = DEFAULT_SALT_BUCKETS
) -> DataFrame:
    """repartition(lang_bucket, salt) — the sort_by_lang analog
    (pipeline.rs:313-326) with skew salting (SURVEY.md §4.4): one
    dominant language would otherwise serialize into one task. AQE
    skew handling only applies to joins, hence the manual salt."""
    salt = F.pmod(F.xxhash64(F.col("clip_id")), F.lit(salt_buckets))
    return df.repartition(n_partitions, F.col("lang_bucket"), salt)


def run(
    clips: DataFrame,
    term_to_category: dict[str, str] | None = None,
    n_partitions: int | None = None,
    arpa_dir: str | None = None,
    audio_gate: bool = False,
    rate_gate: bool = False,
) -> DataFrame:
    """Production plan: Catalyst heuristics → ONE fused Python node
    (LID + TLSH + perplexity, operators/model_stage.py) → keep filter
    → blocklist/scrub (Catalyst) → salted repartition → sink columns.

    vs. the modular ``kept_output(decide(...))`` composition this
    fuses the three model UDFs into a single ArrowEvalPython node and
    blocks the keep-filter from duplicating it, so the audio ``bytes``
    column crosses the JVM row-queue exactly once instead of 3-4×
    (measured 313 s → see BENCH/BASELINE.md at sf0.1). Decisions are
    identical — same kernels, same stage order; asserted by
    tests/test_pipeline_f1.py::test_fused_matches_modular and the
    clips_kept driver oracle."""
    from ungoliant_spark.operators.blocklist import apply_blocklist
    from ungoliant_spark.operators.model_stage import make_model_stage_udf

    df = apply_trim(clips)
    df = apply_pfilter(df)
    df = apply_annotators(df)
    heur_keep = (
        F.col("trim_keep") & F.col("pfilter_keep") & F.col("annotation_keep")
    )
    df = df.withColumn("heuristic_keep", heur_keep)
    # heuristic drops reach the model node with a NULLED input (O(1)
    # in the UDF) instead of being filtered out before it: a filter
    # below the Python node gets pushed to the scan and re-evaluates
    # the whole interpreted higher-order heuristic chain per row —
    # A/B measured at sf0.1/local[32]: pre-filter 35-118 s vs
    # nulled-input 15-54 s across contention windows. Survivors ship
    # as ONE joined string (see make_model_stage_udf: flat Arrow
    # buffer beats list<string> transport); zero-line survivors also
    # map to NULL, which the model scores identically (lang None).
    model_in = F.when(
        F.col("heuristic_keep") & (F.size("lines") > 0),
        F.array_join(F.col("lines"), "\n"),
    )
    df = df.withColumn("_m", make_model_stage_udf(arpa_dir)(model_in))
    df = (
        df.withColumn("lang", F.col("_m.lang"))
        .withColumn("lang_prob", F.col("_m.lang_prob"))
        .withColumn("sentence_langs", F.col("_m.sentence_langs"))
        .withColumn("tlsh", F.col("_m.tlsh"))
        .withColumn("harmful_pp", F.col("_m.harmful_pp"))
        .drop("_m")
    )
    kept = df.filter(F.col("heuristic_keep") & F.col("lang").isNotNull())
    if term_to_category:
        kept = apply_blocklist(kept, term_to_category)
    else:
        kept = kept.withColumn(
            "categories", F.lit(None).cast("array<string>")
        )
    kept = apply_scrub(kept)
    kept = kept.withColumn("lang_bucket", F.col("lang"))
    if audio_gate:
        # audio-side gate (opt-in): the gate branch re-scans ONLY
        # (clip_id, bytes, codec, sr_hz) through the single shared
        # decode pass and equi-joins back on clip_id — the kept rows'
        # bytes column still never crosses Arrow, and transcript-side
        # survivors that fail the audio gate are dropped here with
        # their reasons recorded via decide(audio_gate=True) /
        # audio_gate_columns for audits
        # decode artifacts ride along from the SAME decode pass and
        # land on the kept rows as metadata columns: afp feeds the
        # follow-on acoustic dedup passes (--audio-dedup /
        # --ref-fingerprints) and frame_energy feeds --vad, so none
        # of them re-decodes the kept corpus (round-6 verdict item 3)
        aq = audio_gate_columns(clips, extra=("afp", "frame_energy"))
        kept = (
            kept.join(aq, "clip_id", "left")
            .withColumn(
                "quality_warnings",
                F.concat(
                    "quality_warnings",
                    F.coalesce(
                        "audio_warnings",
                        F.array().cast("array<string>"),
                    ),
                ),
            )
            .filter(F.coalesce("audio_keep", F.lit(False)))
            .drop("audio_keep", "audio_warnings")
        )
    if rate_gate:
        # cross-modal sanity gate over the RAW transcript (pre-scrub,
        # matching decide(rate_gate=True)): pure Catalyst over two
        # columns already in the row, so the only plan change is a
        # filter + warning append — no join, no decode
        kept = _apply_rate_gate(kept).filter(F.col("rate_ok")).drop(
            "rate_ok"
        )
    if n_partitions:
        kept = salted_repartition(kept, n_partitions)
    # audio-gated runs append afp after the stable column set, so the
    # default (ungated) sink schema stays bit-identical
    out_cols = FINAL_COLUMNS + (
        ["afp", "frame_energy"] if audio_gate else []
    )
    return kept.select(
        *[
            F.col("scrubbed").alias("transcript") if c == "transcript" else c
            for c in out_cols
        ]
    )
