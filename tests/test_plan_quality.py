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


def test_zipf_topk_has_no_global_window_over_full_table(spark):
    """Round-2 verdict item 3: ranking the full distinct-word table
    through an unpartitioned Window sorts billions of rows in one
    task at corpus scale. The top-100 must be taken FIRST via
    orderBy+limit (TakeOrderedAndProject — per-partition heaps,
    parallel); any Window in the plan may only run above that 100-row
    limit."""
    from ungoliant_spark.plans.dataset_queries import q_zipf_check

    plan = _plan(q_zipf_check(spark, SF))
    assert "TakeOrderedAndProject" in plan, plan
    # the single-partition exchange feeding the Window must sit ABOVE
    # the TakeOrderedAndProject (i.e. over ≤100 rows), not below it
    win_pos = plan.find("Window")
    take_pos = plan.find("TakeOrderedAndProject")
    assert win_pos != -1 and take_pos != -1
    # executedPlan prints top-down: Window (consumer) appears before
    # TakeOrderedAndProject (producer) when it runs over the limit
    assert win_pos < take_pos, plan


def test_ivf_centroid_budget_is_constant(spark):
    """Round-2 verdict item 4: the coarse quantizer's centroid count
    must be independent of corpus size (vec_id % 97 grew it O(N))."""
    from ungoliant_spark.operators.similarity import IVF_N_CELLS, _centroids

    embs = spark.read.parquet(f"{SF}/embeddings.parquet")
    n_total = embs.count()
    assert n_total > IVF_N_CELLS  # the budget actually binds here
    assert _centroids(embs, "vec_id", "embedding").count() == IVF_N_CELLS
    # and on a 4x-larger corpus the count is THE SAME (fixed budget)
    bigger = embs.union(
        embs.withColumn("vec_id", F.col("vec_id") + F.lit(1_000_000))
    ).union(
        embs.withColumn("vec_id", F.col("vec_id") + F.lit(2_000_000))
    )
    assert _centroids(bigger, "vec_id", "embedding").count() == IVF_N_CELLS


def test_degenerate_dup_clusters_stay_subquadratic(spark):
    """Round-2 verdict item 5: a corpus dominated by IDENTICAL (and
    empty) documents must not blow up pair candidate generation
    quadratically. 4k identical docs + 2k empty docs => the band
    joins see ONE representative per distinct value, and the full
    quadratic pair set exists only in the OUTPUT expansion."""
    from ungoliant_spark.operators.dedup import (
        jaccard_pairs,
        minhash_lsh_pairs,
        simhash_pairs,
    )

    n_same, n_empty = 200, 100
    rows = [(i, "the same exact document body repeated verbatim")
            for i in range(n_same)]
    rows += [(10_000 + i, "") for i in range(n_empty)]
    rows += [(20_000, "a unique document unlike any other entirely")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    exp_same = n_same * (n_same - 1) // 2
    exp_empty = n_empty * (n_empty - 1) // 2

    sim = simhash_pairs(docs).toPandas()
    # identical docs pair at hamming 0; empty docs share simhash 0
    assert len(sim[sim.hamming == 0]) >= exp_same + exp_empty
    # <3-token docs carry one whole-text shingle (shingles_of), so the
    # 100 empty docs share the shingle set {h("")} and pair at 1.0
    # among themselves, exactly like the identical docs
    mh = minhash_lsh_pairs(docs).toPandas()
    assert len(mh[mh.jaccard == 1.0]) == exp_same + exp_empty
    jc = jaccard_pairs(docs).toPandas()
    assert len(jc[jc.jaccard == 1.0]) == exp_same + exp_empty

    # the REPRESENTATIVE-level band joins are the quadratic hazard:
    # assert the candidate side is deduplicated before the self-join
    # by checking plans contain an aggregate on the group key below
    # the join (structural, cheap) — and, behaviorally, that the run
    # above completed at all (the naive form at 10k identical docs
    # stalls for minutes).
    for df in (simhash_pairs(docs), minhash_lsh_pairs(docs)):
        plan = _plan(df)
        assert "HashAggregate" in plan


def test_simhash_pairs_rejects_lossy_max_hamming(spark):
    from ungoliant_spark.operators.dedup import simhash_pairs

    docs = spark.createDataFrame(
        [(1, "a b c")], "doc_id long, text string"
    )
    with pytest.raises(ValueError, match="lossless"):
        simhash_pairs(docs, max_hamming=4)


def test_bucketed_rebuild_join_has_no_exchange(spark):
    """Co-bucketed lineage/clips tables must rebuild with a
    shuffle-free sort-merge join: zero Exchange in the executed plan
    (the plain rebuild shuffles the full source corpus on the record
    id — the largest avoidable data movement at 10^12 clips). Result
    must equal the plain path row-for-row."""
    from ungoliant_spark.plans.checkpoint import lineage_of, rebuild
    from ungoliant_spark.plans.pipeline import decide, kept_output
    from ungoliant_spark.sources.bucketed import (
        rebuild_bucketed,
        write_bucketed,
    )
    from ungoliant_spark.sources.fixtures import generate

    clips = spark.read.parquet(f"{generate(0.001)}/clips.parquet")
    kept = kept_output(decide(clips))
    lineage = lineage_of(kept, "chunk-00000")
    write_bucketed(lineage, "t_lineage_b", "record_id", 4)
    write_bucketed(
        clips.withColumnRenamed("clip_id", "record_id")
        .select("record_id", "transcript"),
        "t_clips_b", "record_id", 4,
    )
    try:
        # keep AQE from broadcasting the small test tables — the gate
        # is about the large-table plan shape
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        df = rebuild_bucketed(spark, "t_lineage_b", "t_clips_b")
        rows = df.collect()
        plan = _plan(df)
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan, plan
        # bit-identical to the plain (shuffling) rebuild
        plain = {
            (r["record_id"], r["content"])
            for r in rebuild(lineage, clips).collect()
        }
        assert {(r["record_id"], r["content"]) for r in rows} == plain
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS t_lineage_b")
        spark.sql("DROP TABLE IF EXISTS t_clips_b")


def test_salted_repartition_bounds_write_skew(spark):
    """Round-4 verdict item 4 — MEASURED skew evidence for the salt:
    on the fixture's documented ~70%-'en' language distribution
    (FIXTURES.md §3.12), repartitioning by lang alone serializes the
    dominant language into one write task (max/mean partition input
    > 4), while the salted repartition (plans/pipeline.py::
    salted_repartition, the sort_by_lang analog of
    /root/reference/src/pipelines/oscardoc/pipeline.rs:313-326)
    bounds every task to ≤ ~2× the mean. Partition row counts ARE
    the write-task inputs (one task per partition at the sink)."""
    import statistics

    from ungoliant_spark.plans.pipeline import salted_repartition

    n, parts = 20_000, 8
    others = F.array(F.lit("fr"), F.lit("de"), F.lit("es"))
    df = spark.range(n).select(
        F.concat(F.lit("clip-"), F.col("id")).alias("clip_id"),
        F.when(F.col("id") % 10 < 7, F.lit("en"))
        .otherwise(
            F.element_at(others, (F.col("id") % 3 + 1).cast("int"))
        )
        .alias("lang_bucket"),
    )

    def partition_counts(d):
        rows = (
            d.groupBy(F.spark_partition_id().alias("p"))
            .count()
            .collect()
        )
        counts = {r["p"]: r["count"] for r in rows}
        # include empty partitions: they are idle write tasks
        return [counts.get(i, 0) for i in range(parts)]

    mean = n / parts
    unsalted = partition_counts(df.repartition(parts, F.col("lang_bucket")))
    salted = partition_counts(salted_repartition(df, parts))
    assert sum(unsalted) == sum(salted) == n
    # unsalted: the 70% language lands in ONE task → straggler
    assert max(unsalted) / mean > 4, unsalted
    # salted: (lang, salt) spreads 'en' over SALT_BUCKETS hash keys;
    # every write task is bounded near the mean
    assert max(salted) / mean <= 2, salted
    # and the spread is real, not one lucky partition
    assert statistics.pstdev(salted) < statistics.pstdev(unsalted) / 2
