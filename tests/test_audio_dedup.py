"""Acoustic-fingerprint near-dup detection (audio_ops.audio_dup_pairs).

The fixture plants a near-dup re-upload every DUP_PERIOD rows
(sources/fixtures.py: same PCM as the previous clip, gain 0.75, light
noise floor, independently drawn container) — exactly the duplicate
class text dedup cannot catch, since the transcript stays the row's
own. These tests pin: the fingerprint kernel twins are bit-identical,
the fingerprint is gain-invariant by construction, planted dups are
recalled while unrelated clips stay far away in Hamming space, and the
banded pair join stays cartesian-free (the same lossless-LSH plan
shape already gated for text simhash).
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from ungoliant_spark.operators.audio_ops import (
    AFP_BANDS,
    afp63,
    audio_dup_pairs,
    audio_stats,
)
from ungoliant_spark.sources.fixtures import (
    DUP_OFFSET,
    DUP_PERIOD,
    generate,
    is_dup_row,
)

SF = 0.001


@pytest.fixture(scope="module")
def fx_dir():
    return generate(SF)


def test_afp_kernel_twins_bit_identical():
    """Engine kernel (add.at + padded concatenate) vs the oracle's
    independently-coded twin (bincount + slice sums) on random
    spectra: same 63-bit word, always."""
    from ungoliant_spark.oracle_sql_clips import _afp_independent

    rng = np.random.default_rng(7)
    for sr in (8000, 16000, 44100):
        for _ in range(50):
            n = int(rng.integers(64, 4096))
            spec = rng.random(n // 2 + 1) * rng.choice([1.0, 1e-6, 1e6])
            freqs = np.fft.rfftfreq(n, d=1.0 / sr)
            assert afp63(spec, freqs) == _afp_independent(spec, freqs, sr)


def test_afp_gain_invariance():
    """Positive gain rescales every band energy by the same factor, so
    every sign bit survives — the property that makes the fingerprint
    catch the fixture's 0.75-gain re-uploads."""
    rng = np.random.default_rng(11)
    spec = rng.random(513)
    freqs = np.fft.rfftfreq(1024, d=1.0 / 16000)
    word = afp63(spec, freqs)
    for gain in (0.1, 0.75, 3.7, 1000.0):
        assert afp63(spec * gain, freqs) == word
    assert word.bit_length() <= 63  # BIGINT-safe, no sign-bit traps


def _eligible_pairs(n: int) -> set[tuple[str, str]]:
    return {
        (f"clip-{i - 1:08d}", f"clip-{i:08d}")
        for i in range(n)
        if is_dup_row(i)
    }


def test_planted_dups_recalled_and_nothing_else(spark, fx_dir):
    """Every found pair is a planted (prev, dup) pair — precision 1.0
    against the plant rule — and recall at the default threshold is
    high (the noise floor occasionally flips a 4th bit; those planted
    pairs are the documented miss class, not unrelated collisions)."""
    clips = spark.read.parquet(f"{fx_dir}/clips.parquet")
    n = clips.count()
    got = {
        (r["clip_a"], r["clip_b"])
        for r in audio_dup_pairs(clips).collect()
    }
    planted = _eligible_pairs(n)
    assert got <= planted, got - planted  # no false pairs at all
    assert len(got) >= 0.8 * len(planted), (len(got), len(planted))


def test_unrelated_clips_far_in_hamming(spark, fx_dir):
    """Separation: across every non-planted pair in a 150-clip sample
    (~11k pairs), minimum Hamming distance stays an order of magnitude
    above the threshold — near-dup hits are signal, not collision
    luck. (Docstring claim: planted p95 = 3 vs >= 19 unrelated.)"""
    clips = spark.read.parquet(f"{fx_dir}/clips.parquet").limit(150)
    rows = (
        audio_stats(clips)
        .filter(F.col("decode_ok"))
        .select("clip_id", "afp")
        .collect()
    )
    fps = {r["clip_id"]: r["afp"] for r in rows}
    ids = sorted(fps)
    min_unrelated = 63
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            if (a, b) in _eligible_pairs(len(ids)):
                continue
            d = bin(fps[a] ^ fps[b]).count("1")
            min_unrelated = min(min_unrelated, d)
    assert min_unrelated >= 10, min_unrelated


def test_dup_rows_survive_anomaly_skip():
    """The plant rule never lands on (or right after) a planted
    anomaly row, so the anomaly classes stay pure and every dup pair
    has a decodable, gate-clean base."""
    dup_rows = [i for i in range(5000) if is_dup_row(i)]
    assert dup_rows, "plant rule produced no rows"
    assert all(i % DUP_PERIOD == DUP_OFFSET for i in dup_rows)
    from ungoliant_spark.sources.fixtures import AUDIO_ANOMALY_PERIOD

    for i in dup_rows:
        assert i % AUDIO_ANOMALY_PERIOD not in (1, 2, 3)
        assert (i - 1) % AUDIO_ANOMALY_PERIOD not in (1, 2, 3)


def test_audio_dup_components_cluster_plants(spark, fx_dir):
    """Every planted (prev, dup) pair lands in the same component
    with the lower clip as rep; everything unplanted is a singleton —
    the clusters a dedup pass would keep one representative from."""
    from ungoliant_spark.operators.audio_ops import audio_dup_components

    clips = spark.read.parquet(f"{fx_dir}/clips.parquet")
    n = clips.count()
    comp = {
        r["clip_id"]: r["component_rep"]
        for r in audio_dup_components(clips).collect()
    }
    assert len(comp) == n  # all clips decodable in this fixture
    planted = _eligible_pairs(n)
    clustered = {cid for cid, rep in comp.items() if rep != cid}
    # every clustered clip is the dup side of a planted pair, with
    # its predecessor as rep
    for cid in clustered:
        i = int(cid.split("-")[1])
        assert is_dup_row(i), cid
        assert comp[cid] == f"clip-{i - 1:08d}", (cid, comp[cid])
    assert len(clustered) >= 0.8 * len(planted)


def test_audio_dedup_against_even_odd(spark, fx_dir):
    """Cross-corpus lookup with refs = even-index clips, new = odd:
    every flagged clip is a planted dup whose even-index predecessor
    is its reference, annotation is total over the new side, and
    plants with an even index (reference not in the ref corpus's
    Hamming ball) do NOT flag."""
    from pyspark.sql import functions as F

    from ungoliant_spark.operators.audio_ops import audio_dedup_against

    clips = spark.read.parquet(f"{fx_dir}/clips.parquet")
    n = clips.count()
    idx = F.substring("clip_id", 6, 8).cast("int")
    new = clips.filter(idx % 2 == 1)
    out = {
        r["clip_id"]: r
        for r in audio_dedup_against(
            new, clips.filter(idx % 2 == 0)
        ).collect()
    }
    assert len(out) == new.count()  # total annotation
    flagged = {c for c, r in out.items() if r["is_dup"]}
    # BOTH orientations must flag: an odd re-upload against its even
    # predecessor, and an odd ORIGINAL against its own even re-upload
    # (the content exists in the reference corpus either way)
    expect_ref = {}
    for i in range(n):
        if is_dup_row(i):
            if i % 2 == 1:
                expect_ref[f"clip-{i:08d}"] = f"clip-{i - 1:08d}"
            else:
                expect_ref[f"clip-{i - 1:08d}"] = f"clip-{i:08d}"
    assert flagged <= set(expect_ref), flagged - set(expect_ref)
    assert len(flagged) >= 0.8 * len(expect_ref), (
        len(flagged), len(expect_ref)
    )
    for c in flagged:
        assert out[c]["dup_of_ref"] == expect_ref[c], (c, out[c])
        assert out[c]["hamming"] <= 3


def test_audio_dedup_against_precomputed_fingerprints(spark, fx_dir):
    """The production path — reference fingerprints from a committed
    (clip_id, afp) table instead of re-decoding the reference corpus
    — must match the decode-in-line path row for row; passing both
    or neither reference form fails loudly."""
    from pyspark.sql import functions as F

    from ungoliant_spark.operators.audio_ops import (
        audio_dedup_against,
        audio_stats,
    )

    clips = spark.read.parquet(f"{fx_dir}/clips.parquet").limit(400)
    idx = F.substring("clip_id", 6, 8).cast("int")
    new, ref = clips.filter(idx % 2 == 1), clips.filter(idx % 2 == 0)
    fp_table = (
        audio_stats(ref)
        .filter("decode_ok")
        .select("clip_id", "afp")
    )
    inline = {
        r["clip_id"]: (r["dup_of_ref"], r["hamming"], r["is_dup"])
        for r in audio_dedup_against(new, ref).collect()
    }
    precomp = {
        r["clip_id"]: (r["dup_of_ref"], r["hamming"], r["is_dup"])
        for r in audio_dedup_against(
            new, ref_fingerprints=fp_table
        ).collect()
    }
    assert inline == precomp
    with pytest.raises(ValueError, match="exactly one"):
        audio_dedup_against(new)
    with pytest.raises(ValueError, match="exactly one"):
        audio_dedup_against(new, ref, ref_fingerprints=fp_table)

    # the whole family takes precomputed fingerprints: pairs and
    # components over a stats snapshot match the decode-in-line runs
    from ungoliant_spark.operators.audio_ops import (
        audio_dup_components,
        audio_dup_pairs,
    )

    all_fp = (
        audio_stats(clips).filter("decode_ok").select("clip_id", "afp")
    )
    assert sorted(map(tuple, audio_dup_pairs(clips).collect())) == sorted(
        map(tuple, audio_dup_pairs(fingerprints=all_fp).collect())
    )
    assert sorted(
        map(tuple, audio_dup_components(clips).collect())
    ) == sorted(
        map(tuple, audio_dup_components(fingerprints=all_fp).collect())
    )
    with pytest.raises(ValueError, match="exactly one"):
        audio_dup_pairs(clips, fingerprints=all_fp)


def test_audio_dup_pairs_cap_dead_air_cluster(spark):
    """ADVICE r6: identical-fingerprint mega-clusters are a REAL
    acoustic hazard (dead air / tone clips all hash to afp=0);
    audio_dup_pairs threads max_cluster_size to the same _dup_groups
    guard text simhash uses. Contract mirrors the text cap tests:
    capped output == uncapped output restricted to {each over-cap
    cluster's rep} ∪ {all members of ≤cap clusters}."""
    from ungoliant_spark.operators import dedup as dd

    tone = (1 << 40) | (1 << 20) | (1 << 10) | (1 << 5) | 1  # 5 bits
    rows = (
        [(f"dead-{i:02d}", 0) for i in range(12)]  # dead-air cluster
        + [(f"tone-{i:02d}", tone) for i in range(3)]  # small cluster
        # hamming(tone, near)=1 → near-dup of the tones; both stay
        # ≥4 bits from the dead-air word so the clusters don't touch
        + [("near-00", tone ^ (1 << 5))]
    )
    fp = spark.createDataFrame(rows, "clip_id string, afp long")
    uncapped = {
        tuple(r) for r in audio_dup_pairs(fingerprints=fp).collect()
    }
    capped = {
        tuple(r)
        for r in audio_dup_pairs(
            fingerprints=fp, max_cluster_size=3
        ).collect()
    }
    dd.unpersist_group_tables()
    allowed = {"dead-00"} | {f"tone-{i:02d}" for i in range(3)} | {"near-00"}
    assert capped == {
        (a, b, h) for (a, b, h) in uncapped if a in allowed and b in allowed
    }
    # the 12-clip dead-air cluster contributed 66 intra pairs uncapped
    assert len(uncapped) - len(capped) == 66


def test_audio_dedup_against_empty_reference(spark, fx_dir):
    """First run of a recurring pipeline: the reference corpus is
    empty — every new clip must come back is_dup false with null
    dup_of_ref, not crash or drop rows."""
    from pyspark.sql import functions as F

    from ungoliant_spark.operators.audio_ops import audio_dedup_against

    clips = spark.read.parquet(f"{fx_dir}/clips.parquet").limit(50)
    empty_fp = spark.createDataFrame(
        [], "clip_id string, afp long"
    )
    rows = audio_dedup_against(clips, ref_fingerprints=empty_fp).collect()
    assert len(rows) == 50
    assert all(
        not r["is_dup"] and r["dup_of_ref"] is None for r in rows
    )


def test_audio_dup_plan_cartesian_free(spark, fx_dir):
    """The banded-Hamming join inherits text simhash's lossless-LSH
    plan shape: equi-join on (band, chunk), no CartesianProduct, no
    BroadcastNestedLoopJoin anywhere in the executed plan."""
    clips = spark.read.parquet(f"{fx_dir}/clips.parquet")
    from ungoliant_spark.operators.audio_ops import audio_dup_components

    plan = (
        audio_dup_pairs(clips)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    # the components composition inherits the rep-level no-pair-list
    # gate already enforced for the text families
    cplan = (
        audio_dup_components(clips)
        ._jdf.queryExecution()
        .analyzed()
        .toString()
    )
    assert "collect_list" not in cplan, cplan
    assert "CartesianProduct" not in cplan, cplan
    # bipartite cross-corpus lookup: banded equi-joins only
    from pyspark.sql import functions as F

    from ungoliant_spark.operators.audio_ops import audio_dedup_against

    idx = F.substring("clip_id", 6, 8).cast("int")
    mplan = (
        audio_dedup_against(
            clips.filter(idx % 2 == 1), clips.filter(idx % 2 == 0)
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in mplan, mplan
    assert "BroadcastNestedLoopJoin" not in mplan, mplan


def test_committed_stats_snapshot_roundtrip(spark, fx_dir, tmp_path):
    """The production invariant behind the job's fingerprint reuse
    (round-6 verdict item 6): an audio_stats output COMMITTED to
    parquet and read back feeds audio_dup_components(fingerprints=...)
    and audio_dedup_against(ref_fingerprints=... / new_fingerprints=
    ...) bit-identically with the decode-in-line path — the parquet
    roundtrip loses nothing (afp stays int64 through Arrow, ids stay
    strings)."""
    from pyspark.sql import functions as F

    from ungoliant_spark.operators.audio_ops import (
        audio_dedup_against,
        audio_dup_components,
        audio_stats,
    )

    clips = spark.read.parquet(f"{fx_dir}/clips.parquet").limit(400)
    snap = str(tmp_path / "stats_snapshot")
    audio_stats(clips).write.parquet(snap)
    stats = spark.read.parquet(snap)
    assert dict(stats.dtypes)["afp"] == "bigint"
    fp = stats.filter(
        F.col("decode_ok") & F.col("afp").isNotNull()
    ).select("clip_id", "afp")

    inline_comp = sorted(
        map(tuple, audio_dup_components(clips).collect())
    )
    snap_comp = sorted(
        map(tuple, audio_dup_components(fingerprints=fp).collect())
    )
    assert inline_comp == snap_comp

    idx = F.substring("clip_id", 6, 8).cast("int")
    new, ref = clips.filter(idx % 2 == 1), clips.filter(idx % 2 == 0)
    ref_fp = fp.join(ref.select("clip_id"), "clip_id")
    new_fp = fp.join(new.select("clip_id"), "clip_id")
    inline = sorted(
        map(tuple, audio_dedup_against(new, ref).collect())
    )
    via_snapshot = sorted(
        map(
            tuple,
            audio_dedup_against(
                new, ref_fingerprints=ref_fp
            ).collect(),
        )
    )
    both_precomputed = sorted(
        map(
            tuple,
            audio_dedup_against(
                new_fingerprints=new_fp, ref_fingerprints=ref_fp
            ).collect(),
        )
    )
    assert inline == via_snapshot
    # all clips in this slice decode, so the fingerprint-only new
    # side covers the same rows and must agree bit-for-bit too
    assert inline == both_precomputed
    with pytest.raises(ValueError, match="exactly one"):
        audio_dedup_against(new, new_fingerprints=new_fp,
                            ref_fingerprints=ref_fp)
    with pytest.raises(ValueError, match="exactly one"):
        audio_dedup_against(ref_fingerprints=ref_fp)
