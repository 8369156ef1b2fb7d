"""Text-analysis functions for a training-data pipeline: token
counting, stopword-based language guessing, composite quality
scoring, document fingerprinting. Pure Catalyst, oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ungoliant_spark.operators.dedup import (
    hash64,
    let_,
    normalize_text,
    tokens_of,
)

STOPWORDS = {
    "en": ["the", "of", "and", "to", "in", "is", "that", "it", "was", "for"],
    "fr": ["le", "la", "les", "de", "des", "et", "un", "une", "est", "que"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "eine", "zu", "mit"],
    "es": ["el", "los", "las", "de", "y", "es", "que", "un", "una", "por"],
}


def token_count(text: Column) -> Column:
    return F.size(tokens_of(text))


def stopword_hits(text: Column, lang: str) -> Column:
    """Count of token OCCURRENCES that are stopwords of ``lang``."""
    stops = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(
        F.filter(tokens_of(text), lambda t: F.array_contains(stops, t))
    )


def _hits_of(toks: Column, lang: str) -> Column:
    """Stopword occurrence count over an already-computed token array
    (the let-bound form of :func:`stopword_hits`)."""
    stops = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(toks, lambda t: F.array_contains(stops, t)))


def lang_guess(text: Column) -> Column:
    """Argmax of stopword hits with frozen tie order en>fr>de>es.
    Token split let-bound (dedup.let_): one interpreted split per row
    instead of one per language."""

    def body(toks: Column) -> Column:
        s = {lg: _hits_of(toks, lg) for lg in STOPWORDS}
        mx = F.greatest(*s.values())
        out = F.lit(None).cast("string")
        for lg in reversed(list(STOPWORDS)):  # earlier langs win ties
            out = F.when(s[lg] == mx, F.lit(lg)).otherwise(out)
        return F.when(mx > 0, out)

    return let_(tokens_of(text), body)


def punct_ratio(text: Column) -> Column:
    """Non-letter/mark/digit/space chars over all chars."""
    n = F.length(text)
    keep = F.length(
        F.regexp_replace(text, r"[^\p{L}\p{M}\p{N}\s]", "")
    )
    return F.when(n > 0, (n - keep).cast("double") / n).otherwise(0.0)


def _mean_len_of(toks: Column) -> Column:
    total = F.aggregate(
        toks, F.lit(0).cast("long"), lambda a, t: a + F.length(t)
    )
    return F.when(
        F.size(toks) > 0, total.cast("double") / F.size(toks)
    ).otherwise(0.0)


def mean_token_len(text: Column) -> Column:
    return let_(tokens_of(text), _mean_len_of)


def _stop_ratio_of(toks: Column) -> Column:
    hits = None
    for lg in STOPWORDS:
        h = _hits_of(toks, lg)
        hits = h if hits is None else hits + h
    n = F.size(toks)
    return F.when(n > 0, hits.cast("double") / n).otherwise(0.0)


def stopword_ratio(text: Column) -> Column:
    return let_(tokens_of(text), _stop_ratio_of)


def quality_score(text: Column) -> Column:
    """Frozen composite in [0,1]:
      0.3·min(n_tokens/50, 1)            (enough content)
    + 0.3·(1 - min(punct_ratio/0.3, 1))  (not symbol soup)
    + 0.2·min(stopword_ratio/0.2, 1)     (natural-language-like)
    + 0.2·(1 - min(|mean_len-5|/5, 1))   (plausible word lengths)
    rounded to 6 dp. The token split is let-bound once across all
    token-based components (dedup.let_) — the interpreted split used
    to run ~9× per row through this expression."""

    def body(toks: Column) -> Column:
        nt = F.size(toks).cast("double")
        c1 = F.least(nt / 50.0, F.lit(1.0))
        c2 = F.lit(1.0) - F.least(punct_ratio(text) / 0.3, F.lit(1.0))
        c3 = F.least(_stop_ratio_of(toks) / 0.2, F.lit(1.0))
        c4 = F.lit(1.0) - F.least(
            F.abs(_mean_len_of(toks) - 5.0) / 5.0, F.lit(1.0)
        )
        return F.round(0.3 * c1 + 0.3 * c2 + 0.2 * c3 + 0.2 * c4, 6)

    return let_(tokens_of(text), body)


def fingerprint(text: Column) -> Column:
    """64-bit content fingerprint of normalized text."""
    return hash64(normalize_text(text))
