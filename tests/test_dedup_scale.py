"""Mega-dup-cluster guard (round-3 verdict item 2) + rep-mapping
deliverable: a crawl where one boilerplate/empty doc repeats 10^8
times must not OOM the group collect_list or the pair expansion.

The cap's contract: clusters larger than ``max_cluster_size``
participate in pair generation via their representative ONLY; the
member-list aggregation buffer never holds more than cap ids (members
of over-cap clusters are filtered out BEFORE collect_list); the
suppressed counts are logged, never silent."""

from __future__ import annotations

import logging

import pytest
from pyspark.sql import functions as F

from ungoliant_spark.operators import dedup as dd

# three exact-dup clusters: A (big, near-dup of B), B (small), C (big, empty)
N_A, N_B, N_C = 50, 3, 40
TEXT_A = "alpha beta gamma delta epsilon zeta eta theta"
TEXT_B = "alpha beta gamma delta epsilon zeta eta iota"
CAP = 8
A_IDS = list(range(N_A))  # rep 0
B_IDS = [100 + i for i in range(N_B)]  # rep 100
C_IDS = [200 + i for i in range(N_C)]  # rep 200


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, TEXT_A) for i in A_IDS]
    rows += [(i, TEXT_B) for i in B_IDS]
    rows += [(i, "") for i in C_IDS]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_dup_groups_buffers_bounded(spark):
    """The collect_list input is filtered by cluster size BEFORE the
    aggregate: no group's member array exceeds the cap, and over-cap
    groups carry exactly their representative."""
    kv = spark.createDataFrame(
        [(i, i % 3) for i in range(300)] + [(1000, 99)],
        "id long, k long",
    )
    g = {r["k"]: r for r in dd._dup_groups(kv, "k", "id", 10).collect()}
    dd.unpersist_group_tables()
    for k in (0, 1, 2):  # clusters of 100 → rep only
        assert g[k]["ids"] == [g[k]["rep"]] == [k]
    assert g[99]["ids"] == [1000]  # singleton under cap, kept whole
    g2 = dd._dup_groups(kv, "k", "id", 100).collect()
    dd.unpersist_group_tables()
    assert sorted(len(r["ids"]) for r in g2) == [1, 100, 100, 100]


def test_dup_groups_rejects_bad_cap(spark):
    kv = spark.createDataFrame([(1, 1)], "id long, k long")
    with pytest.raises(ValueError, match="max_cluster_size"):
        dd._dup_groups(kv, "k", "id", 0)


def test_jaccard_cap_exact_output(spark, docs, caplog):
    """Capped jaccard on the adversarial fixture: big clusters' intra
    pairs are suppressed, inter pairs route through the rep only —
    the exact 6-row output is deterministic."""
    with caplog.at_level(logging.WARNING, logger="ungoliant_spark.operators.dedup"):
        pairs = dd.jaccard_pairs(docs, max_cluster_size=CAP).toPandas()
        dd.await_cap_logs()  # suppression counts log async on first action
    dd.unpersist_group_tables()
    assert "capped" in caplog.text and "2 clusters" in caplog.text
    got = {(int(r.id_a), int(r.id_b)) for r in pairs.itertuples()}
    exp_intra_b = {(100, 101), (100, 102), (101, 102)}
    exp_inter = {(0, b) for b in B_IDS}  # rep_A × all of B
    assert got == exp_intra_b | exp_inter
    assert (pairs[pairs.id_a == 0].jaccard.round(3) == 0.714).all()


def test_minhash_cap_equals_uncapped_restricted(spark, docs):
    """Capped output == uncapped output restricted to allowed ids
    (reps of over-cap clusters + all members of small clusters) —
    the cap drops rows, never changes surviving scores."""
    uncapped = dd.minhash_lsh_pairs(docs).toPandas()
    capped = dd.minhash_lsh_pairs(docs, max_cluster_size=CAP).toPandas()
    dd.unpersist_group_tables()
    allowed = {0, 200, *B_IDS}
    exp = uncapped[
        uncapped.id_a.isin(allowed) & uncapped.id_b.isin(allowed)
    ]
    key = lambda df: sorted(map(tuple, df[["id_a", "id_b", "jaccard"]].values.tolist()))
    assert key(capped) == key(exp)
    assert len(capped) < len(uncapped)  # the big intra sets are gone


def test_simhash_cap_equals_uncapped_restricted(spark, docs):
    """Same restriction property for simhash — allowed ids derived
    from the ACTUAL simhash clusters (near-dup texts can share a
    simhash word, merging clusters)."""
    sh = dd.simhash63_table(docs).toPandas()
    allowed = set()
    for _, grp in sh.groupby("simhash"):
        ids = sorted(grp.doc_id)
        allowed |= {ids[0]} if len(ids) > CAP else set(ids)
    uncapped = dd.simhash_pairs(docs).toPandas()
    capped = dd.simhash_pairs(docs, max_cluster_size=CAP).toPandas()
    dd.unpersist_group_tables()
    exp = uncapped[
        uncapped.id_a.isin(allowed) & uncapped.id_b.isin(allowed)
    ]
    key = lambda df: sorted(map(tuple, df[["id_a", "id_b", "hamming"]].values.tolist()))
    assert key(capped) == key(exp)
    assert len(capped) < len(uncapped)


def test_exact_dedup_reps_mapping(spark, docs):
    """The production deliverable: id → (rep, cluster_size), no
    collect_list / no window anywhere in the plan."""
    reps = dd.exact_dedup_reps(docs)
    plan = reps._jdf.queryExecution().executedPlan().toString()
    assert "collect_list" not in plan and "Window" not in plan, plan
    assert "partial_min" in plan, plan  # map-side combine before shuffle
    pdf = reps.toPandas().set_index("doc_id")
    assert (pdf.loc[A_IDS].rep_id == 0).all()
    assert (pdf.loc[A_IDS].cluster_size == N_A).all()
    assert (pdf.loc[B_IDS].rep_id == 100).all()
    assert (pdf.loc[C_IDS].cluster_size == N_C).all()
    # dedup consumption: keep one copy per cluster
    kept = pdf[pdf.index == pdf.rep_id]
    assert sorted(kept.index) == [0, 100, 200]


def test_exact_dedup_no_window(spark, docs):
    """Round-3 verdict item 4: representative selection is a partial-
    aggregable groupBy + join, not a per-fingerprint window sort."""
    dedup = dd.exact_dedup(docs)
    plan = dedup._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, plan
    assert "partial_min" in plan, plan
    pdf = dedup.toPandas()
    assert len(pdf) == N_A + N_B + N_C
    assert (~pdf[pdf.doc_id.isin([0, 100, 200])].is_dup).all()
    assert int(pdf.is_dup.sum()) == (N_A - 1) + (N_B - 1) + (N_C - 1)


def test_unpersist_group_tables_releases(spark, docs):
    dd.unpersist_group_tables()  # clean slate
    dd.jaccard_pairs(docs).count()
    assert dd.unpersist_group_tables() >= 1
    assert dd.unpersist_group_tables() == 0


def test_mega_cluster_crawl_scale_completes(spark):
    """The adversarial shape the guard exists for, at a scale where
    the naive path is infeasible: 30k identical + 30k empty docs. The
    naive pair set is ~9×10^8 rows; with cap=100 the run must finish
    in seconds with member buffers ≤ cap and emit exactly the
    rep-routed pairs (zero here — the two clusters are not near-dups
    of each other)."""
    n = 30_000
    ids = spark.range(n)
    docs = (
        ids.select(
            F.col("id").alias("doc_id"),
            F.when(
                F.col("id") < n // 2,
                F.lit("the same exact boilerplate body repeated verbatim"),
            ).otherwise(F.lit("")).alias("text"),
        )
    )
    pairs = dd.simhash_pairs(docs, max_cluster_size=100)
    assert pairs.count() == 0  # both clusters over cap; reps differ
    dd.unpersist_group_tables()
    # the rep-mapping deliverable handles the same corpus with no
    # member lists at all
    reps = dd.exact_dedup_reps(docs)
    agg = reps.groupBy("rep_id").count().collect()
    assert sorted(r["count"] for r in agg) == [n // 2, n // 2]


def test_near_dup_components(spark, monkeypatch):
    """Min-label propagation over pair edges: a 4-node path graph
    (needs >1 round to converge — labels travel one hop per round),
    a 2-clique, and singletons; every node maps to its component's
    min id, and a too-small max_iterations raises instead of
    returning wrong labels. Checked on BOTH paths: the default
    driver union-find fast path (r8) and the distributed loop
    (forced by zeroing DRIVER_CC_MAX_EDGES)."""
    nodes = spark.createDataFrame(
        [(i,) for i in range(9)], "doc_id long"
    )
    # path 3-5-6-8 (edges deliberately not touching the min directly),
    # clique {1,2}, singletons 0,4,7
    pairs = spark.createDataFrame(
        [(5, 3), (5, 6), (6, 8), (1, 2)], "id_a long, id_b long"
    )
    expected = {0: 0, 1: 1, 2: 1, 3: 3, 5: 3, 6: 3, 8: 3, 4: 4, 7: 7}
    got = {
        r["doc_id"]: r["component_rep"]
        for r in dd.near_dup_components(nodes, pairs).collect()
    }
    assert got == expected
    # distributed loop (the >DRIVER_CC_MAX_EDGES crawl-scale path)
    monkeypatch.setattr(dd, "DRIVER_CC_MAX_EDGES", -1)
    got_dist = {
        r["doc_id"]: r["component_rep"]
        for r in dd.near_dup_components(nodes, pairs).collect()
    }
    assert got_dist == expected
    with pytest.raises(RuntimeError, match="did not converge"):
        # label 3 needs 2+ rounds to reach node 8
        dd.near_dup_components(nodes, pairs, max_iterations=1)


def test_simhash_components_equals_pairwise_cc(spark, docs):
    """The rep-level shortcut must equal components over the doc-level
    pair list (the expensive composition it replaces)."""
    via_pairs = {
        r["doc_id"]: r["component_rep"]
        for r in dd.near_dup_components(
            docs, dd.simhash_pairs(docs)
        ).collect()
    }
    via_reps = {
        r["doc_id"]: r["component_rep"]
        for r in dd.simhash_components(docs).collect()
    }
    dd.unpersist_group_tables()
    assert via_pairs == via_reps


def test_dedup_cluster_stats_histogram(spark, docs):
    """log2 cluster-size histogram on the known fixture: clusters of
    50 (A), 3 (B), 40 (C) → bucket 5 holds A+C (min 40, max 50, 90
    docs), bucket 1 holds B. No joins, partial-agg only."""
    got = {
        r["bucket"]: r for r in dd.dedup_cluster_stats(docs).collect()
    }
    assert set(got) == {1, 5}
    assert (got[5]["min_size"], got[5]["max_size"]) == (40, 50)
    assert (got[5]["n_clusters"], got[5]["n_docs"]) == (2, 90)
    assert (got[1]["n_clusters"], got[1]["n_docs"]) == (1, 3)
    plan = dd.dedup_cluster_stats(docs)._jdf.queryExecution()\
        .executedPlan().toString()
    assert "Join" not in plan and "partial_count" in plan, plan


def test_capped_build_triggers_no_spark_jobs(spark, docs):
    """Round-4 verdict item 5: building a guarded pairs DataFrame must
    not run any Spark job (the suppression accounting is an observed
    metric collected on first materialization, not an eager scalar
    aggregate at plan-construction time)."""
    sc = spark.sparkContext
    sc.setJobGroup("dedup-cap-build", "plan construction only")
    try:
        pairs = dd.jaccard_pairs(docs, max_cluster_size=CAP)
        pairs2 = dd.minhash_lsh_pairs(docs, max_cluster_size=CAP)
    finally:
        sc.setLocalProperty("spark.jobGroup.id", None)
    assert list(sc.statusTracker().getJobIdsForGroup("dedup-cap-build")) == []
    # the plans still materialize correctly afterwards
    assert pairs.count() > 0 and pairs2.count() > 0
    dd.await_cap_logs()
    dd.unpersist_group_tables()


def test_group_cache_scope_releases_blocks(spark, docs):
    """Round-4 verdict item 6: after materializing pairs inside a
    group_cache_scope and exiting, no group-table RDD blocks remain
    persisted (leak-free default for long-lived sessions)."""
    dd.unpersist_group_tables()  # clean slate

    def persisted_ids():
        return {
            int(k)
            for k in spark.sparkContext._jsc.getPersistentRDDs().keySet()
        }

    before = persisted_ids()
    with dd.group_cache_scope():
        dd.jaccard_pairs(docs).count()
        assert len(dd._PERSISTED_GROUPS) >= 1
    assert dd._PERSISTED_GROUPS == []
    assert persisted_ids() <= before  # nothing new left behind
    # nested scopes release only their own tail
    with dd.group_cache_scope():
        dd.jaccard_pairs(docs).count()
        outer_n = len(dd._PERSISTED_GROUPS)
        with dd.group_cache_scope():
            dd.minhash_lsh_pairs(docs).count()
            assert len(dd._PERSISTED_GROUPS) > outer_n
        assert len(dd._PERSISTED_GROUPS) == outer_n
    assert dd._PERSISTED_GROUPS == []


def test_minhash_jaccard_components_equal_pairwise_cc(spark, docs):
    """Round-4 verdict item 1: the pairless rep-level compositions for
    MinHash and Jaccard must equal components over their doc-level
    pair lists (the expensive composition they replace)."""
    for pair_fn, comp_fn in [
        (dd.minhash_lsh_pairs, dd.minhash_components),
        (dd.jaccard_pairs, dd.jaccard_components),
    ]:
        via_pairs = {
            r["doc_id"]: r["component_rep"]
            for r in dd.near_dup_components(
                docs, pair_fn(docs, threshold=0.5)
            ).collect()
        }
        via_reps = {
            r["doc_id"]: r["component_rep"]
            for r in comp_fn(docs, threshold=0.5).collect()
        }
        dd.unpersist_group_tables()
        assert via_pairs == via_reps, pair_fn.__name__


def test_components_reject_bad_threshold(spark, docs):
    for fn in (dd.minhash_components, dd.jaccard_components):
        with pytest.raises(ValueError, match="threshold"):
            fn(docs, threshold=1.2)
        with pytest.raises(ValueError, match="threshold"):
            fn(docs, threshold=0.0)


def test_components_no_doc_level_pairs_in_plan(spark, docs):
    """The rep-level compositions must not build doc-level pair lists
    or member arrays: no collect_list in any analyzed plan, and the
    only explode nodes are the shingle/band explodes (which are
    per-doc-bounded), never an ids-array expansion."""
    for comp_fn in (dd.minhash_components, dd.jaccard_components,
                    dd.simhash_components):
        out = comp_fn(docs)
        plan = out._jdf.queryExecution().analyzed().toString()
        assert "collect_list" not in plan, (comp_fn.__name__, plan)
        assert "ids_a" not in plan and "ids_b" not in plan, comp_fn.__name__
    dd.unpersist_group_tables()


def test_components_string_ids(spark):
    """near_dup_components (and the rep compositions) must work with
    STRING ids — min-label propagation is lexicographic and the
    changed-label convergence check never casts (ADVICE r4: the old
    decimal-sum check crashed under ANSI and silently converged after
    one round under non-ANSI). The path graph needs >1 round, so a
    silent one-round convergence would return wrong labels here."""
    nodes = spark.createDataFrame(
        [(f"clip-{i}",) for i in range(9)], "doc_id string"
    )
    pairs = spark.createDataFrame(
        [("clip-5", "clip-3"), ("clip-5", "clip-6"), ("clip-6", "clip-8"),
         ("clip-1", "clip-2")],
        "id_a string, id_b string",
    )
    got = {
        r["doc_id"]: r["component_rep"]
        for r in dd.near_dup_components(nodes, pairs).collect()
    }
    assert got == {
        "clip-0": "clip-0", "clip-1": "clip-1", "clip-2": "clip-1",
        "clip-3": "clip-3", "clip-5": "clip-3", "clip-6": "clip-3",
        "clip-8": "clip-3", "clip-4": "clip-4", "clip-7": "clip-7",
    }
    # end-to-end rep composition on string ids (the pipeline's clip_id)
    docs = spark.createDataFrame(
        [("c-1", "alpha beta gamma delta"), ("c-2", "alpha beta gamma delta"),
         ("c-3", "totally different words here")],
        "doc_id string, text string",
    )
    comp = {
        r["doc_id"]: r["component_rep"]
        for r in dd.simhash_components(docs).collect()
    }
    dd.unpersist_group_tables()
    assert comp == {"c-1": "c-1", "c-2": "c-1", "c-3": "c-3"}


def test_simhash_components_mega_cluster_no_cap_needed(spark):
    """On the 30k-identical + 30k-empty corpus the rep graph has TWO
    nodes — no cap, no pair materialization, completes instantly and
    labels every doc with its cluster's min id."""
    n = 30_000
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(
            F.col("id") < n // 2,
            F.lit("the same exact boilerplate body repeated verbatim"),
        ).otherwise(F.lit("")).alias("text"),
    )
    comp = dd.simhash_components(docs)
    agg = {
        r["component_rep"]: r["count"]
        for r in comp.groupBy("component_rep").count().collect()
    }
    dd.unpersist_group_tables()
    # two clusters unless their simhash words happen to be within
    # hamming 3 of each other (they are not: text vs empty)
    assert agg == {0: n // 2, n // 2: n // 2}
