"""Plan-quality gates: the physical plans must show the properties
the 100 TB design depends on — predicate pushdown and column pruning
at the parquet scan, broadcast joins for small dims, partial
aggregation before shuffles, and no Python nodes in heuristic-only
stages. Also: results must be independent of input partitioning."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown_and_pruning(spark):
    df = spark.read.parquet(f"{SF}/documents.parquet")
    q = df.filter(F.col("doc_id") < 100).select("doc_id", "n_chars")
    plan = _plan(q)
    assert "PushedFilters: [" in plan and "LessThan(doc_id,100)" in plan, plan
    # only the projected columns reach the scan
    assert "ReadSchema: struct<doc_id:bigint,n_chars:bigint>" in plan, plan


def test_heuristic_stages_have_no_python_nodes(spark):
    from ungoliant_spark.plans.document_queries import heuristic_frame

    plan = _plan(heuristic_frame(spark, SF))
    assert "Python" not in plan and "InPandas" not in plan


def test_blocklist_join_is_broadcast(spark):
    from ungoliant_spark.operators.blocklist import (
        categories_via_broadcast_join,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet").withColumnRenamed(
        "doc_id", "clip_id"
    ).withColumnRenamed("text", "content")
    bl = spark.createDataFrame(
        [("key", "adult"), ("agg", "adult")], "term string, category string"
    )
    plan = _plan(categories_via_broadcast_join(docs, bl))
    # the token×terms join must be broadcast (the rejoin of per-doc
    # hits is left to AQE, which sizes it at runtime)
    assert "BroadcastHashJoin" in plan, plan


def test_minhash_has_partial_aggregation(spark):
    from ungoliant_spark.operators.dedup import minhash_lsh_pairs

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _plan(minhash_lsh_pairs(docs))
    # partial_min before the exchange = map-side combine of signatures
    assert "partial_min" in plan, plan


def test_knn_query_side_is_broadcast(spark):
    from ungoliant_spark.operators.similarity import cosine_topk

    embs = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = embs.filter(F.col("vec_id") < 20)
    plan = _plan(cosine_topk(embs, q))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_near_dup_joins_are_not_cartesian(spark):
    """Round-1 verdict flagged the embedding near-dup as an all-pairs
    cartesian (O(n²) at 10⁹ vectors). The production paths must all
    be equi-joins on bucket keys — no CartesianProduct and no
    BroadcastNestedLoopJoin anywhere in their plans."""
    from ungoliant_spark.operators.dedup import minhash_lsh_pairs, simhash_pairs
    from ungoliant_spark.operators.similarity import embedding_near_dup_pairs

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    embs = spark.read.parquet(f"{SF}/embeddings.parquet")
    for df in (
        embedding_near_dup_pairs(embs, threshold=0.5),
        simhash_pairs(docs),
        minhash_lsh_pairs(docs),
    ):
        plan = _plan(df)
        assert "CartesianProduct" not in plan, plan
        assert "BroadcastNestedLoopJoin" not in plan, plan


def test_decisions_independent_of_partitioning(spark):
    """The pipeline decision for a row may not depend on which task
    computed it (the local[2]-vs-local[8] determinism requirement,
    SURVEY.md §5, checked via 1-vs-32-partition runs)."""
    from ungoliant_spark.plans.pipeline import decide
    from ungoliant_spark.sources.fixtures import generate

    clips = spark.read.parquet(f"{generate(0.001)}/clips.parquet")
    cols = ["clip_id", "keep", "lang", "lang_prob"]
    one = {
        r["clip_id"]: (r["keep"], r["lang"], r["lang_prob"])
        for r in decide(clips.repartition(1)).select(cols).collect()
    }
    many = {
        r["clip_id"]: (r["keep"], r["lang"], r["lang_prob"])
        for r in decide(clips.repartition(32)).select(cols).collect()
    }
    assert one == many
