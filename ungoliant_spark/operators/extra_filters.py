"""The two reference operators that exist but are never wired into
the reference's own pipeline — implemented for completeness so a
reference user can run every operator the codebase defines.

* MeanLength (src/filtering/sentence.rs:44-112): stateful per-line
  filter. For each line IN ORDER: update running mean / population
  std with the line's codepoint length FIRST, then keep iff
  |len − mean| < std (f64 math; the first line is always dropped
  since std == 0). Implemented as a per-row array expression — the
  running state is a prefix aggregate, so no cross-row state is
  needed.
* Conv (src/transformers/sentence_filter.rs:70-149): RemoveShort-
  Sentences with a moving-average (window 5) over BYTE lengths in
  f32, edge-padded with the first/last value; lines are trimmed from
  both ends while the convolved length < 100. The reference panics
  on an empty document (`first().unwrap()`); our spec returns
  no-kept-range instead.

Both are pure Catalyst (higher-order array functions); parity with a
line-by-line Python transcription is tested in
tests/test_extra_filters.py and against the driver oracles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ungoliant_spark.functions.lines import rust_lines

CONV_SIZE = 5
CONV_MIN_LENGTH = 100.0


def meanlength_flags(lines: Column) -> Column:
    """array<boolean> — MeanLength::detect_mut per line (update-then-
    test, prefix statistics)."""
    lens = F.transform(lines, lambda x: F.length(x).cast("double"))

    def flag(_, i):
        prefix = F.slice(lens, 1, i + 1)
        n = (i + 1).cast("double")
        s = F.aggregate(prefix, F.lit(0.0), lambda a, v: a + v)
        p = F.aggregate(prefix, F.lit(0.0), lambda a, v: a + v * v)
        mean = s / n
        std = F.sqrt(p / n - mean * mean)
        cur = F.element_at(lens, i + 1)
        return F.abs(cur - mean) < std

    return F.transform(lines, flag)


def conv_bounds(lines: Column) -> Column:
    """struct<line_start:int, line_end:int> — inclusive kept range
    after window-5 mean convolution over byte lengths (f32, matching
    the Rust `as f32` sums), or nulls when nothing survives."""
    lens = F.transform(lines, lambda x: F.octet_length(x).cast("float"))
    pad = CONV_SIZE // 2
    first = F.element_at(lens, 1)
    last = F.element_at(lens, -1)
    padded = F.concat(
        F.array_repeat(first, pad), lens, F.array_repeat(last, pad)
    )
    n = F.size(lines)
    # sequence(1, 0) would generate a DESCENDING [1, 0]; clamp the
    # empty-doc case (the n > 0 guard below nulls the result anyway)
    conv = F.transform(
        F.sequence(F.lit(1), F.greatest(n, F.lit(1))),
        lambda i: F.aggregate(
            F.slice(padded, i, CONV_SIZE),
            F.lit(0.0).cast("float"),
            lambda a, v: (a + v).cast("float"),
        )
        / F.lit(float(CONV_SIZE)).cast("float"),
    )
    ok = F.transform(conv, lambda c: c >= F.lit(CONV_MIN_LENGTH))
    first_pos = F.array_position(ok, True)
    last_pos = F.when(
        first_pos > 0,
        F.size(ok) - F.array_position(F.reverse(ok), True) + 1,
    )
    start = F.when((n > 0) & (first_pos > 0), first_pos - 1).cast("int")
    end = F.when((n > 0) & (first_pos > 0), last_pos - 1).cast("int")
    return F.struct(start.alias("line_start"), end.alias("line_end"))


def apply_conv_trim(
    df: DataFrame, transcript_col: str = "transcript"
) -> DataFrame:
    """Add conv_line_start / conv_line_end / conv_content columns
    (the Conv::transform_idx output shape: inclusive range + rewritten
    body)."""
    lines = rust_lines(F.col(transcript_col))
    b = conv_bounds(lines)
    df = df.withColumn("_cb", b).withColumn("_lines", lines)
    content = F.when(
        F.col("_cb.line_start").isNotNull(),
        F.array_join(
            F.slice(
                F.col("_lines"),
                F.col("_cb.line_start") + 1,
                F.col("_cb.line_end") - F.col("_cb.line_start") + 1,
            ),
            "\n",
        ),
    )
    return (
        df.withColumn("conv_line_start", F.col("_cb.line_start"))
        .withColumn("conv_line_end", F.col("_cb.line_end"))
        .withColumn("conv_content", content)
        .drop("_cb", "_lines")
    )
