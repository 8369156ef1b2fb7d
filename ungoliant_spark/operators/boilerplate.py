"""Corpus-frequency boilerplate line removal — the C4-style pass that
drops lines occurring (near-)verbatim across many documents (cookie
banners, navigation chrome, legal footers). The reference's trimming
is per-document (length rules, trim.py twin); corpus-level line
frequency is inherently a distributed aggregation, specified fresh
here Spark-first.

Shape: explode (doc, pos, line) once; count DISTINCT documents per
normalized-line hash (two partial-aggregable groupBys — the
(line, doc) dedup then the per-line count — never a count-distinct
sketch, so the decision is exact); join the per-line doc-frequency
back and drop lines above the threshold; reassemble each document's
surviving lines in original position order. The reassembly
collect_list is bounded by DOCUMENT size (a few hundred lines), not
corpus size — no mega-cluster hazard. Works on the clips table's
``lines`` array (the pipeline's own per-document line structure).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ungoliant_spark.operators.dedup import _persist_groups, hash64

# broadcast the boilerplate key set only below this row count
# (~8 B/long key + hashed-relation overhead ⇒ well under executor
# memory); above it the join falls back to a shuffle join and AQE —
# enabled in session.py / jobs — may still re-pick broadcast from
# real size stats (ADVICE r5: an unconditional hint could OOM the
# driver when a tiny max_doc_frac makes the over-threshold set huge)
MAX_BROADCAST_KEYS = 4_000_000


def _norm_line(line) -> "F.Column":
    return F.regexp_replace(F.lower(F.trim(line)), r"\s+", " ")


def line_doc_frequency(
    df: DataFrame, id_col: str = "clip_id", lines_col: str = "lines"
) -> DataFrame:
    """(line_key, n_docs, example) — per normalized line, the number
    of DISTINCT documents containing it (a line repeated inside one
    doc counts once) plus one example string for reporting."""
    ex = df.select(
        F.col(id_col).alias("_doc"),
        F.explode(lines_col).alias("line"),
    ).select(
        "_doc",
        _norm_line(F.col("line")).alias("norm"),
    ).filter(F.col("norm") != "")
    per_doc = ex.select(
        "_doc", hash64(F.col("norm")).alias("line_key"), "norm"
    ).dropDuplicates(["_doc", "line_key"])
    return per_doc.groupBy("line_key").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("norm").alias("example"),
    )


def remove_frequent_lines(
    df: DataFrame,
    max_doc_frac: float,
    id_col: str = "clip_id",
    lines_col: str = "lines",
    total_docs: int | None = None,
) -> DataFrame:
    """Drop every line whose document frequency exceeds
    ``max_doc_frac`` of the corpus; returns the input rows with
    ``lines`` replaced by the surviving lines (original order) plus
    ``n_boilerplate_lines`` dropped per doc. ``total_docs`` lets a
    caller pass a known corpus size; otherwise one scalar count
    (metadata-cheap on parquet) fixes the denominator. NOT a lazy
    plan: the boilerplate key set is materialized (persisted via the
    dedup group-cache registry) and counted so the join side is
    broadcast only under ``MAX_BROADCAST_KEYS``. Blank lines
    are never counted as boilerplate (they carry no content signal);
    the frequency key is whitespace/case-normalized, the kept text is
    the ORIGINAL line."""
    if not (0.0 < max_doc_frac <= 1.0):
        raise ValueError(
            f"max_doc_frac must be in (0, 1], got {max_doc_frac}"
        )
    n_total = total_docs if total_docs is not None else df.count()
    cutoff = int(max_doc_frac * n_total)
    freq = line_doc_frequency(df, id_col, lines_col)
    # persist (group-cache registry: released by dedup.group_cache_scope
    # / unpersist_group_tables) so the size check and the join read one
    # materialization of the two-groupBy aggregation, then broadcast
    # only when the key set is provably small
    boiler = _persist_groups(
        freq.filter(F.col("n_docs") > cutoff).select("line_key")
    )
    boiler_side = boiler.withColumn("is_boiler", F.lit(True))
    if boiler.count() <= MAX_BROADCAST_KEYS:
        boiler_side = F.broadcast(boiler_side)
    ex = df.select(
        F.col(id_col),
        F.posexplode(lines_col).alias("pos", "line"),
    ).withColumn("line_key", hash64(_norm_line(F.col("line"))))
    marked = ex.join(boiler_side, "line_key", "left")
    rebuilt = marked.groupBy(id_col).agg(
        F.array_sort(
            F.collect_list(
                F.when(
                    F.col("is_boiler").isNull(),
                    F.struct("pos", "line"),
                )
            )
        ).alias("kept"),
        F.sum(
            F.when(F.col("is_boiler").isNotNull(), 1).otherwise(0)
        ).alias("n_boilerplate_lines"),
    ).select(
        id_col,
        F.transform("kept", lambda s: s["line"]).alias(lines_col),
        "n_boilerplate_lines",
    )
    return (
        df.drop(lines_col)
        .join(rebuilt, id_col, "left")
        .withColumn(
            lines_col,
            F.coalesce(
                lines_col, F.array().cast("array<string>")
            ),
        )
        .withColumn(
            "n_boilerplate_lines",
            F.coalesce("n_boilerplate_lines", F.lit(0)).cast("long"),
        )
    )
