"""Pure-Python per-row oracle, transcribed line-by-line from the Rust
reference. Used to (a) generate the frozen expected-label table for
the clips fixture and (b) property-test the Catalyst expressions
(SURVEY.md §5 "hard parts" mitigation).

This module is intentionally NOT Spark code — it is the independent
re-derivation of the reference semantics that the engine is graded
against. Every function cites its source in /root/reference.
"""

from __future__ import annotations

import math
import re
import unicodedata
from dataclasses import dataclass, field

from ungoliant_spark import config as C
from ungoliant_spark.operators.scrub import SCRUB_CHAIN


def rust_lines(text: str) -> list[str]:
    """Rust str::lines(): split on '\\n', strip a trailing '\\r' only
    where it preceded a '\\n' (CRLF), no empty final line after a
    trailing newline. A document ending in a bare '\\r' keeps it."""
    if text == "":
        return []
    strip_last = text.endswith("\n")
    if strip_last:
        text = text[:-1]
    parts = text.split("\n")
    return [
        ln[:-1]
        if ln.endswith("\r") and (i < len(parts) - 1 or strip_last)
        else ln
        for i, ln in enumerate(parts)
    ]


def length_detect(line: str, min_size: int = C.LENGTH_MIN_CODEPOINTS) -> bool:
    """Length filter: chars().count() > min_size (sentence.rs:27-37)."""
    return len(line) > min_size


def trim(lines: list[str]) -> tuple[int | None, int | None, list[str]]:
    """RemoveShortSentences (sentence_filter.rs:178-252): skip leading
    and trailing lines failing Length::detect; return (start, end)
    0-based inclusive + kept lines. (None, None, []) when all short."""
    idx = [i for i, ln in enumerate(lines) if length_detect(ln)]
    if not idx:
        return None, None, []
    start, end = idx[0], idx[-1]
    return start, end, lines[start : end + 1]


def pfilter(lines: list[str]) -> bool:
    """PFilter (record.rs:34-97): codepoint counts bucketed at >= 100;
    keep iff not (upper < 0.6 * total)."""
    upper = 0
    lower = 0
    for ln in lines:
        count = len(ln)
        if count >= C.PFILTER_MIN_CODEPOINTS:
            upper += count
        else:
            lower += count
    threshold = C.PFILTER_THRESHOLD * float(upper + lower)
    return not (float(upper) < threshold)


def annotate_tiny(lines: list[str]) -> bool:
    """tiny.rs:5-20."""
    return len(lines) < C.TINY_MIN_LINES


def annotate_short_sentences(lines: list[str]) -> bool:
    """sentence_filter.rs:17-56 (note the f32 multiply + `as usize`
    truncation of the threshold)."""
    nb_short = sum(1 for ln in lines if not length_detect(ln))
    threshold = int(C.SHORT_SENTENCES_THRESHOLD * float(len(lines)))
    return nb_short > threshold


def annotate_header_footer(lines: list[str]) -> tuple[bool, bool]:
    """header.rs:12-88 — BYTE lengths, f64 floors."""
    n = len(lines)
    win = math.floor(n * C.HEADER_PCTG)
    thr = math.floor(win * C.HEADER_THRESHOLD_PCTG)
    win = int(win)

    def short_count(seq):
        return sum(
            1 for ln in seq if len(ln.encode("utf-8")) < C.HEADER_MIN_BYTES
        )

    is_header = short_count(lines[:win]) > thr
    is_footer = short_count(list(reversed(lines))[:win]) > thr
    return is_header, is_footer


def _is_letter_or_mark(ch: str) -> bool:
    return unicodedata.category(ch)[0] in ("L", "M")


def annotate_noisy(content: str) -> bool:
    """noisy.rs:10-53 — closed form of the early-exit loop."""
    nb_chars = len(content)
    threshold = math.floor(nb_chars * C.NOISY_THRESHOLD)
    nonletters = sum(1 for ch in content if not _is_letter_or_mark(ch))
    return nonletters > threshold


def quality_warnings(lines: list[str], content: str) -> list[str]:
    """Annotator chain in reference add-order (pipeline.rs:467-474)."""
    out: list[str] = []
    if annotate_tiny(lines):
        out.append("tiny")
    if annotate_short_sentences(lines):
        out.append("short_sentences")
    is_header, is_footer = annotate_header_footer(lines)
    if is_header:
        out.append("header")
    if is_footer:
        out.append("footer")
    if annotate_noisy(content):
        out.append("noisy")
    return out


def noisy_tiny_drop(warnings: list[str]) -> bool:
    """Set-equality spec of pipeline.rs:219-226 (SURVEY.md §2.2)."""
    return set(warnings) == C.NOISY_TINY_DROP and len(warnings) == 2


def mean_length_flags(lines: list[str]) -> list[bool]:
    """MeanLength::detect_mut transcription (sentence.rs:44-112):
    update running mean / population std with the line's codepoint
    length, THEN keep iff |len - mean| < std. First line: std=0 →
    dropped."""
    flags = []
    n = 0
    s = 0.0
    p = 0.0
    for ln in lines:
        length = float(len(ln))
        n += 1
        s += length
        p += length * length
        mean = s / n
        std = math.sqrt(p / n - mean * mean)
        flags.append(abs(length - mean) < std)
    return flags


def conv_trim(
    lines: list[str], conv_size: int = 5, min_length: float = 100.0
) -> tuple[int | None, int | None, str | None]:
    """Conv::transform_idx transcription (sentence_filter.rs:70-149):
    edge-padded window-`conv_size` moving average over BYTE lengths
    in f32, trim both ends while convolved < min_length. Returns
    (start, end, content) inclusive, or (None, None, None) — our spec
    for the empty doc, where the reference panics on first().unwrap().
    """
    import numpy as np

    if not lines:
        return None, None, None
    lens = [np.float32(len(ln.encode("utf-8"))) for ln in lines]
    pad = conv_size // 2
    padded = [lens[0]] * pad + lens + [lens[-1]] * pad
    conv = []
    for i in range(len(lines)):
        acc = np.float32(0.0)
        for v in padded[i : i + conv_size]:
            acc = np.float32(acc + v)
        conv.append(np.float32(acc / np.float32(conv_size)))
    ok = [c >= np.float32(min_length) for c in conv]
    if not any(ok):
        return None, None, None
    start = ok.index(True)
    end = len(ok) - 1 - ok[::-1].index(True)
    return start, end, "\n".join(lines[start : end + 1])


def scrub(text: str) -> str:
    """The frozen PII chain (operators/scrub.py) via Python re —
    identical greedy, lookaround-free patterns."""
    for pattern, token in SCRUB_CHAIN:
        # This twin mirrors the PRODUCTION engine (Java regex) exactly:
        # \d is rewritten to explicit [0-9] because Java's \d is
        # ASCII-only while Python's default is unicode (the unmodified
        # pattern would scrub Arabic-Indic/fullwidth-digit phone
        # numbers the engine does not); \b KEEPS Python's unicode word
        # semantics, which matches the Java quirk that \b is
        # unicode-aware even though \w/\d are ASCII ("café1.2.3.4" has
        # no boundary before the 1 in either). The DuckDB oracle (RE2)
        # has an ASCII \b instead — test_heuristics_parity pins both
        # the shared three-way domain and the known \b divergences.
        # the textual \d→[0-9] rewrite is only valid OUTSIDE character
        # classes ([\d.] would corrupt to [[0-9].]); fail loudly if a
        # future SCRUB_CHAIN edit introduces one (ADVICE r7)
        assert not re.search(r"\[[^\]]*\\d", pattern), (
            f"scrub twin cannot rewrite \\d inside a character class: "
            f"{pattern!r}"
        )
        text = re.sub(pattern.replace(r"\d", "[0-9]"), token, text)
    return text


@dataclass
class HeuristicResult:
    trim_keep: bool
    line_start: int | None
    line_end: int | None
    content: str
    pfilter_keep: bool
    quality_warnings: list[str] = field(default_factory=list)
    annotation_keep: bool = True
    keep: bool = False
    scrubbed: str | None = None


def heuristic_pipeline(transcript: str) -> HeuristicResult:
    """The full non-model pipeline slice, in reference stage order
    (pipeline.rs:162-226): trim → drop-if-empty → PFilter → annotate →
    noisy+tiny drop → scrub (our PII pass on kept content)."""
    lines = rust_lines(transcript)
    start, end, kept = trim(lines)
    content = "\n".join(kept)
    if start is None:
        return HeuristicResult(False, None, None, "", False)
    pf = pfilter(kept)
    if not pf:
        return HeuristicResult(True, start, end, content, False)
    warnings = quality_warnings(kept, content)
    ann_keep = not noisy_tiny_drop(warnings)
    res = HeuristicResult(True, start, end, content, True, warnings, ann_keep)
    res.keep = ann_keep
    if res.keep:
        res.scrubbed = scrub(content)
    return res
