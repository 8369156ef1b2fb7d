"""MeanLength + Conv — the reference's two unwired operators
(sentence.rs:44-112, sentence_filter.rs:70-149): Catalyst expressions
must match the line-by-line Python transcription, and Conv must
reproduce the reference docstring's worked example."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from ungoliant_spark import oracle
from ungoliant_spark.functions.lines import rust_lines
from ungoliant_spark.operators.extra_filters import (
    apply_conv_trim,
    meanlength_flags,
)


def _docs():
    rng = random.Random(99)
    docs = [
        "",
        "\n",
        "single line",
        "a\nb\nc",
        "x" * 100,
        "\n".join("y" * rng.randint(1, 200) for _ in range(12)),
        # the Conv docstring example (sentence_filter.rs:60-66):
        # lengths 1 1 1 100 1 1 1 1 1 100 100 100 100 100 1 1 1 1
        "\n".join(
            "z" * n
            for n in [1, 1, 1, 100, 1, 1, 1, 1, 1,
                      100, 100, 100, 100, 100, 1, 1, 1, 1]
        ),
        # normal-ish lengths (the reference's randomized MeanLength
        # test shape, sentence.rs:114-168)
        "\n".join(
            "n" * max(1, int(rng.gauss(100, 20))) for _ in range(30)
        ),
        "é" * 80,  # multibyte: 80 codepoints / 160 bytes (Conv uses bytes)
        ("é" * 60 + "\n") * 6,
    ]
    for _ in range(60):
        k = rng.randint(1, 15)
        docs.append(
            "\n".join("w" * rng.randint(0, 250) for _ in range(k))
        )
    return docs


def test_meanlength_parity(spark):
    docs = _docs()
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "id long, text string"
    )
    got = {
        r["id"]: r["flags"]
        for r in df.select(
            "id",
            meanlength_flags(rust_lines(F.col("text"))).alias("flags"),
        ).collect()
    }
    for i, t in enumerate(docs):
        exp = oracle.mean_length_flags(oracle.rust_lines(t))
        assert got[i] == exp, (i, repr(t[:60]))
    # first line of any non-empty doc is always dropped (std == 0)
    for i, t in enumerate(docs):
        if got[i]:
            assert got[i][0] is False


def test_conv_parity_and_example(spark):
    docs = _docs()
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "id long, transcript string"
    )
    out = {
        r["id"]: (r["conv_line_start"], r["conv_line_end"], r["conv_content"])
        for r in apply_conv_trim(df).collect()
    }
    for i, t in enumerate(docs):
        exp = oracle.conv_trim(oracle.rust_lines(t))
        assert out[i] == exp, (i, repr(t[:60]))
    # the docstring example (sentence_filter.rs:60-66): the isolated
    # length-100 line at index 3 is averaged away as intended. Note
    # the docstring HOPES to keep the whole 100×5 block, but the
    # actual math (window-5 mean vs min_length=100, strict skip-while
    # `conv < 100`) only reaches 100.0 at the block's center — index
    # 11 — which is exactly what the Rust code computes too.
    start, end, content = out[6]
    assert (start, end) == (11, 11)
    assert content == "z" * 100
