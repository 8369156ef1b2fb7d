"""Within-document repetition signals — the Gopher-rules family
(Rae et al. 2021, §A1.1: "repetition" filters adopted by most
published LLM pipelines): a document that keeps repeating the same
n-grams is boilerplate/spam even when every individual heuristic
passes. The reference has no analog (its annotators are length/
ratio-based); specified fresh here, Spark-first.

Two signals per n-gram size:

* ``dup{n}_frac`` — fraction of n-gram OCCURRENCES that are repeats
  (1 − distinct/total). Pure per-row Catalyst (array ops).
* ``top{n}_char_frac`` — characters covered by the single most
  frequent n-gram (count × gram length / doc length). Needs the
  per-doc n-gram mode, computed with ONE explode + hash-aggregate on
  (doc, gram) — map-side combinable, task memory bounded by a doc's
  distinct grams — then a per-doc max; never a window, never a
  per-doc collect of the gram list.

Ties on the mode break deterministically by (count, gram) struct
max, mirrored in the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ungoliant_spark.operators.dedup import let_, tokens_of


def _grams(text, n: int):
    """NON-distinct word n-gram strings (array<string>) — repetition
    needs occurrence counts, unlike dedup's distinct shingle sets.
    The token split is let-bound (dedup.let_) so the interpreted
    regex split+filter runs once per row, not 3×."""

    def body(toks):
        idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
        return F.when(
            F.size(toks) >= n,
            F.transform(
                idx, lambda i: F.array_join(F.slice(toks, i + 1, n), " ")
            ),
        ).otherwise(F.array().cast("array<string>"))

    return let_(tokens_of(text), body)


def repetition_signals(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ns: tuple[int, ...] = (2, 3),
) -> DataFrame:
    """(id, dup{n}_frac, top{n}_char_frac for each n in ``ns``) —
    rounded to 6 dp; docs with fewer than n tokens score 0.0 on both
    (nothing repeats). A total annotation: one output row per input
    row."""
    out = df.select(F.col(id_col), F.length(text_col).alias("_len"))
    for n in ns:
        # ONE evaluation of the interpreted gram expression per row
        # (the explode), then everything — occurrence total, distinct
        # count, and the mode — comes out of the SAME two partial-
        # aggregable groupBys. Deriving dup_frac from per-row
        # size(grams)/size(array_distinct(grams)) instead re-evaluates
        # the whole higher-order gram chain per reference (projection
        # collapse inlines the alias): measured 35 s → ~3 s at
        # sf0.1/local[32] for this explode-once form.
        ex = df.select(
            F.col(id_col),
            F.explode(_grams(F.col(text_col), n)).alias("g"),
        )
        stats = (
            ex.groupBy(id_col, "g")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .groupBy(id_col)
            .agg(
                F.sum("cnt").alias(f"_tot{n}"),
                F.count(F.lit(1)).alias(f"_dis{n}"),
                F.max(F.struct("cnt", "g")).alias("m"),
            )
            .select(
                id_col,
                f"_tot{n}",
                f"_dis{n}",
                F.col("m.cnt").alias(f"_cnt{n}"),
                F.length(F.col("m.g")).alias(f"_glen{n}"),
            )
        )
        # docs with < n tokens emit no grams (empty array → explode
        # drops them) → left-join nulls → both signals 0.0
        out = (
            out.join(stats, id_col, "left")
            .withColumn(
                f"dup{n}_frac",
                F.when(
                    F.col(f"_tot{n}").isNotNull(),
                    F.round(
                        1.0
                        - F.col(f"_dis{n}").cast("double")
                        / F.col(f"_tot{n}"),
                        6,
                    ),
                ).otherwise(F.lit(0.0)),
            )
            .withColumn(
                f"top{n}_char_frac",
                F.when(
                    F.col(f"_cnt{n}").isNotNull() & (F.col("_len") > 0),
                    F.round(
                        F.col(f"_cnt{n}")
                        * F.col(f"_glen{n}").cast("double")
                        / F.col("_len"),
                        6,
                    ),
                ).otherwise(F.lit(0.0)),
            )
            .drop(f"_tot{n}", f"_dis{n}", f"_cnt{n}", f"_glen{n}")
        )
    return out.drop("_len")
