"""TLSH operator: determinism, format, silent failure on short
input, and locality (similar → small distance, different → large)."""

from __future__ import annotations

import random

from ungoliant_spark.operators.tlsh_op import distance, tlsh_hash


def _text(rng, n_words=400):
    words = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot",
             "golf", "hotel", "india", "juliet", "kilo", "lima"]
    return " ".join(rng.choice(words) for _ in range(n_words))


def test_format_and_determinism():
    rng = random.Random(1)
    t = _text(rng)
    h1 = tlsh_hash(t.encode())
    h2 = tlsh_hash(t.encode())
    assert h1 == h2
    assert h1.startswith("T1")
    assert len(h1) == 2 + 2 * (3 + 2 + 64)  # checksum3 + L + Q + 64 body

    assert distance(h1, h1) == 0


def test_short_input_returns_none():
    assert tlsh_hash(b"") is None
    assert tlsh_hash(b"too short") is None
    assert tlsh_hash(b"a" * 49) is None
    # long but zero-variance input fails the nonzero-bucket check
    assert tlsh_hash(b"a" * 1000) is None


def test_locality():
    rng = random.Random(2)
    base = _text(rng, 600)
    mutated = base.replace("alpha", "alpha9", 5)  # small edit
    other = _text(random.Random(99), 600)
    h, hm, ho = (tlsh_hash(x.encode()) for x in (base, mutated, other))
    d_sim = distance(h, hm)
    d_diff = distance(h, ho)
    assert d_sim < d_diff, (d_sim, d_diff)


def test_spark_udf(spark):
    from pyspark.sql import functions as F

    from ungoliant_spark.operators.tlsh_op import apply_tlsh

    rng = random.Random(3)
    rows = [(i, _text(rng)) for i in range(8)] + [(8, "short"), (9, None)]
    df = spark.createDataFrame(rows, "id long, content string")
    got = {r["id"]: r["tlsh"] for r in apply_tlsh(df).collect()}
    for i, text in rows:
        exp = tlsh_hash(text.encode()) if text else None
        assert got[i] == exp
