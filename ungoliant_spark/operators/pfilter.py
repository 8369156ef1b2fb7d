"""PFilter — keep docs whose long-line mass is >= 60% of total.

Reference: /root/reference/src/filtering/record.rs:34-97.
Per line, the codepoint count is added to the *upper* bucket when
``count >= min_size`` (note >=, record.rs:59-69 — deliberately
different from Length's strict >), else to the *lower* bucket.
Keep iff ``upper >= threshold * (upper + lower)`` as f64
(record.rs:72-84; reject branch is ``upper < threshold*total``).

Runs on the *trimmed* content — the pipeline applies
RemoveShortSentences first (pipeline.rs:162-198).

Spark-first: a single ``aggregate`` higher-order fold computing both
bucket sums in one pass; the ratio test is a plain double comparison.
No shuffle, no UDF, whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ungoliant_spark.config import PFILTER_MIN_CODEPOINTS, PFILTER_THRESHOLD


def pfilter_keep(
    lines: Column,
    threshold: float = PFILTER_THRESHOLD,
    min_len: int = PFILTER_MIN_CODEPOINTS,
) -> Column:
    """Boolean keep decision over an array<string> of lines."""
    buckets = F.aggregate(
        lines,
        F.struct(
            F.lit(0).cast("long").alias("upper"),
            F.lit(0).cast("long").alias("total"),
        ),
        lambda acc, x: F.struct(
            (
                acc["upper"]
                + F.when(F.length(x) >= F.lit(min_len), F.length(x)).otherwise(0)
            ).alias("upper"),
            (acc["total"] + F.length(x)).alias("total"),
        ),
    )
    upper = buckets["upper"].cast("double")
    total = buckets["total"].cast("double")
    # reference rejects iff upper < threshold * total (record.rs:79-84)
    return ~(upper < F.lit(float(threshold)) * total)


def apply_pfilter(df: DataFrame, lines_col: str = "lines") -> DataFrame:
    return df.withColumn("pfilter_keep", pfilter_keep(F.col(lines_col)))
