"""Quality annotators — metadata-adders that never change content.

Reference chain (registration order tiny, short_sentences, header,
lsh, noisy, contentdetector: /root/reference/src/pipelines/oscardoc/
pipeline.rs:467-483; chained via src/transformers/annotate.rs:10-30).
All run on the *trimmed* document content.

Every rule here is a pure Catalyst expression (higher-order array
functions + one Unicode regex) — no Python, no shuffle.

Annotations produced: tiny, short_sentences, header, footer, noisy —
collected in order of the reference's add-order into
``quality_warnings`` (array<string>).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ungoliant_spark.config import (
    HEADER_MIN_BYTES,
    HEADER_PCTG,
    HEADER_THRESHOLD_PCTG,
    LENGTH_MIN_CODEPOINTS,
    NOISY_THRESHOLD,
    SHORT_SENTENCES_THRESHOLD,
    TINY_MIN_LINES,
)

# Unicode Letter|Mark — same UCD categories as unic_ucd
# GeneralCategory is_letter()||is_mark() (src/transformers/noisy.rs:26-30)
_LETTER_MARK_RE = r"[\p{L}\p{M}]"


def tiny(lines: Column, min_lines: int = TINY_MIN_LINES) -> Column:
    """'tiny': < 5 lines (src/transformers/tiny.rs:5-20)."""
    return F.size(lines) < F.lit(min_lines)


def short_sentences(
    lines: Column,
    threshold: float = SHORT_SENTENCES_THRESHOLD,
    min_len: int = LENGTH_MIN_CODEPOINTS,
) -> Column:
    """'short_sentences': short-line count > (threshold * nb_lines as f32)
    as usize (truncation, src/transformers/sentence_filter.rs:36-42).
    A short line fails Length::detect, i.e. codepoint length <= 100."""
    nb_short = F.size(F.filter(lines, lambda x: F.length(x) <= F.lit(min_len)))
    thr = F.floor(F.lit(float(threshold)) * F.size(lines).cast("float")).cast("long")
    return nb_short.cast("long") > thr


def _short_byte_count(window: Column, min_bytes: int) -> Column:
    return F.size(F.filter(window, lambda x: F.octet_length(x) < F.lit(min_bytes)))


def header_footer(
    lines: Column,
    header_pctg: float = HEADER_PCTG,
    threshold_pctg: float = HEADER_THRESHOLD_PCTG,
    min_bytes: int = HEADER_MIN_BYTES,
):
    """('header', 'footer') booleans.

    Window = first/last floor(0.2*nb_lines) lines; a short line has BYTE
    length < 100 (src/transformers/header.rs:38-55,81 — bytes, unlike the
    codepoint-based filters); annotate when short-count >
    floor(floor(0.2*n)*0.5) (f64 floors, header.rs:38-40).
    """
    n = F.size(lines)
    win = F.floor(n.cast("double") * F.lit(header_pctg)).cast("int")
    thr = F.floor(win.cast("double") * F.lit(threshold_pctg)).cast("long")
    head = F.slice(lines, 1, win)
    tail = F.slice(F.reverse(lines), 1, win)
    is_header = _short_byte_count(head, min_bytes).cast("long") > thr
    is_footer = _short_byte_count(tail, min_bytes).cast("long") > thr
    return is_header, is_footer


def noisy(content: Column, threshold: float = NOISY_THRESHOLD) -> Column:
    """'noisy': non-Letter/Mark char count > floor(0.5 * nb_chars)
    (src/transformers/noisy.rs:10-53; the early-exit loop there is a
    pure optimization — the decision equals this closed form).

    ``content`` is the full joined document content, so the '\\n'
    separators count as non-letters, exactly as in the reference.
    """
    nb_chars = F.length(content)
    nonletters = nb_chars - F.length(
        F.regexp_replace(content, r"[^\p{L}\p{M}]", "")
    )
    thr = F.floor(nb_chars.cast("double") * F.lit(threshold)).cast("long")
    return nonletters.cast("long") > thr


def quality_warnings(
    lines: Column, content: Column
) -> Column:
    """array<string> of annotations in reference add-order
    (tiny, short_sentences, header, footer, noisy — pipeline.rs:467-474;
    header adds 'header' before 'footer', header.rs:42-55)."""
    is_header, is_footer = header_footer(lines)
    pairs = [
        ("tiny", tiny(lines)),
        ("short_sentences", short_sentences(lines)),
        ("header", is_header),
        ("footer", is_footer),
        ("noisy", noisy(content)),
    ]
    arr = F.array(
        *[F.when(cond, F.lit(name)) for name, cond in pairs]
    )
    return F.filter(arr, lambda x: x.isNotNull())


def noisy_tiny_drop(warnings: Column) -> Column:
    """True when the doc must be dropped: annotation set == {noisy, tiny}.

    Documented intent of pipeline.rs:219-226 ("remove documents that are
    both tiny and noisy"); the reference's literal Vec equality against
    ["noisy","tiny"] is order-sensitive and never matches its own
    add-order — we implement the documented set semantics (SURVEY.md
    §2.2 quirk note).
    """
    return F.array_sort(warnings) == F.array(F.lit("noisy"), F.lit("tiny"))


def apply_annotators(df: DataFrame, lines_col: str = "lines") -> DataFrame:
    """Add ``content`` (trimmed, '\\n'-joined), ``quality_warnings`` and
    ``annotation_keep`` (false iff the noisy+tiny drop fires)."""
    df = df.withColumn("content", F.array_join(F.col(lines_col), "\n"))
    df = df.withColumn(
        "quality_warnings", quality_warnings(F.col(lines_col), F.col("content"))
    )
    return df.withColumn(
        "annotation_keep", ~noisy_tiny_drop(F.col("quality_warnings"))
    )
