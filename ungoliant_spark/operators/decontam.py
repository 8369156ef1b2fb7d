"""Benchmark decontamination — flag training documents that share
n-grams with an evaluation/benchmark set, the standard pre-training
hygiene pass (every published LLM data pipeline runs one; the
reference has no analog — its blocklist is term-level, not
overlap-level, content_detector.rs — so this is specified fresh,
Spark-first).

Shape: the benchmark side is reduced to a DISTINCT n-gram hash set
and broadcast (benchmarks are tiny next to a crawl — thousands of
documents vs 10^12); each training doc's distinct shingles
inner-join the broadcast set and one partial-aggregable groupBy
counts overlaps per doc. No shuffle of the corpus: the only wide
operation is the per-doc count, keyed by doc id, combined map-side.
The same portable md5-based shingle hash as the dedup family, so the
DuckDB oracle recomputes the decision bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ungoliant_spark.operators.dedup import shingles_of


def flag_contaminated(
    df: DataFrame,
    bench_df: DataFrame,
    n: int = 3,
    min_overlap: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str | None = None,
) -> DataFrame:
    """(id, n_overlap_ngrams, contaminated) for EVERY input doc:
    ``n_overlap_ngrams`` counts the doc's distinct word n-grams that
    appear anywhere in the benchmark set, and ``contaminated`` is
    true at ≥ ``min_overlap`` (production uses ~13-grams and
    min_overlap 1; the fixture's short texts test with 3-grams).
    Docs with zero overlap are preserved via a left join so the
    output is a total annotation, not a filter."""
    if min_overlap < 1:
        raise ValueError(f"min_overlap must be >= 1, got {min_overlap}")
    btext = bench_text_col or text_col
    bench_grams = (
        bench_df.select(
            F.explode(shingles_of(F.col(btext), n)).alias("g")
        )
        .distinct()
    )
    doc_grams = df.select(
        F.col(id_col),
        F.explode(shingles_of(F.col(text_col), n)).alias("g"),
    )
    overlaps = (
        doc_grams.join(F.broadcast(bench_grams), "g")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_overlap_ngrams"))
    )
    return (
        df.select(id_col)
        .join(overlaps, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_overlap_ngrams", F.lit(0)).alias(
                "n_overlap_ngrams"
            ),
            (
                F.coalesce("n_overlap_ngrams", F.lit(0))
                >= F.lit(min_overlap)
            ).alias("contaminated"),
        )
    )
