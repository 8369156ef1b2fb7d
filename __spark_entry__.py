"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship heuristic quality-filter query on sf0.001.
queries()     — one entry per implemented operator (SURVEY.md §2).
oracle_sql()  — DuckDB twins for the SQL-expressible ones.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ungoliant_spark import oracle_sql as osql
from ungoliant_spark.plans import document_queries as dq


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: heuristic keep/drop + PII scrub over sf0.001."""
    return dq.q_heuristic_keep(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "trim_bounds": dq.q_trim_bounds,
        "pfilter": dq.q_pfilter,
        "quality_annotations": dq.q_quality_annotations,
        "heuristic_keep": dq.q_heuristic_keep,
        "pii_scrub": dq.q_pii_scrub,
        "keep_stats": dq.q_keep_stats,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "trim_bounds": osql.oracle_trim_bounds(),
        "pfilter": osql.oracle_pfilter(),
        "quality_annotations": osql.oracle_quality_annotations(),
        "heuristic_keep": osql.oracle_heuristic_keep(),
        "pii_scrub": osql.oracle_pii_scrub(),
        "keep_stats": osql.oracle_keep_stats(),
    }
