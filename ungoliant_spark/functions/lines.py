"""Line-splitting and length primitives as pure Catalyst expressions.

The reference's sub-row unit is the "sentence": a newline-separated
string inside a record body, produced by Rust's ``str::lines()``
(doc comment /root/reference/src/pipelines/oscardoc/pipeline.rs:12).

``str::lines()`` semantics we must emulate exactly:
  * splits on '\n'
  * strips one trailing '\r' from each line (CRLF support)
  * a final trailing newline does NOT yield an empty last line
  * "" yields zero lines, "\n" yields one empty line

Lengths: the reference mixes units deliberately —
  * Length / PFilter count Unicode codepoints
    (chars().count(), src/filtering/sentence.rs:28, src/filtering/record.rs:61)
  * Header/Footer counts BYTES (line.len(), src/transformers/header.rs:81)
Spark's ``length()`` on strings counts codepoints (UTF8String.numChars)
and ``octet_length()`` counts UTF-8 bytes, so both map 1:1.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def rust_lines(text: Column) -> Column:
    """array<string> of lines per Rust ``str::lines()`` semantics."""
    # strip at most one trailing '\n' so the final empty slice is not
    # produced. NOT regexp '\n$': Java's $ also matches before a final
    # line terminator, so "a\n\n" would lose BOTH newlines.
    stripped = F.when(
        text.endswith("\n"), F.substring(text, 1, F.length(text) - 1)
    ).otherwise(text)
    parts = F.split(stripped, "\n", -1)
    # '\r' is stripped only when it preceded a '\n' in the original
    # text (Rust strips '\n' first, then one '\r'): that is every
    # segment except the last, and the last too iff the text ended
    # with '\n'. A document ending in a bare '\r' keeps it.
    strip_last = text.endswith("\n")
    arr = F.transform(
        parts,
        lambda x, i: F.when(
            x.endswith("\r")
            & ((i < F.size(parts) - 1) | strip_last),
            F.substring(x, 1, F.length(x) - 1),
        ).otherwise(x),
    )
    # "" must give zero lines (split("") gives [""])
    return F.when(text == F.lit(""), F.array().cast("array<string>")).otherwise(arr)


def codepoint_lengths(lines: Column) -> Column:
    """array<int> of per-line Unicode codepoint counts (Rust chars().count())."""
    return F.transform(lines, lambda x: F.length(x))


def byte_lengths(lines: Column) -> Column:
    """array<int> of per-line UTF-8 byte counts (Rust str::len())."""
    return F.transform(lines, lambda x: F.octet_length(x))
