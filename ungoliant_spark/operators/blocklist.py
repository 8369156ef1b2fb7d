"""Adult-content term blocklist — the ContentDetector analog.

Reference: /root/reference/src/transformers/content_detector.rs:26-64
annotates via UT1 URL/domain blocklists on WarcHeader::TargetURI.
Audio rows have no URL, so per the north_star this becomes a term
blocklist over transcript tokens: a clip whose content contains a
blocklisted term gets the blocklist's category (e.g. "adult")
appended to ``categories`` — annotation only, never a drop
(matching the reference: ContentDetector only annotates).

Two Spark strategies, both shuffle-free on the fact table:

* ``categories_from_terms`` (default): the blocklist is collapsed to
  a literal term→category map; detection is array_intersect +
  transform over the token array — pure Catalyst, fine for blocklists
  up to ~10k terms (UT1 scale).
* ``categories_via_broadcast_join``: general path for huge blocklists
  — explode distinct tokens, broadcast-hash-join against the terms
  DataFrame, re-aggregate. Kept for parity of pattern; the groupBy
  re-aggregation is a shuffle, so prefer the map path when the list
  fits in a literal.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def tokens_of(content: Column) -> Column:
    """Lowercased alphanumeric tokens (split on non-letter/digit),
    matching the oracle's `c.isalnum()` tokenization for ASCII terms."""
    toks = F.split(F.lower(content), r"[^\p{L}\p{N}]+")
    return F.array_distinct(F.filter(toks, lambda x: x != F.lit("")))


def categories_from_terms(
    content: Column, term_to_category: dict[str, str]
) -> Column:
    """array<string> of distinct categories hit, null when none."""
    terms = sorted(term_to_category)
    term_arr = F.array(*[F.lit(t) for t in terms])
    cat_map = F.map_from_arrays(
        F.array(*[F.lit(t) for t in terms]),
        F.array(*[F.lit(term_to_category[t]) for t in terms]),
    )
    hits = F.array_intersect(tokens_of(content), term_arr)
    cats = F.array_sort(
        F.array_distinct(F.transform(hits, lambda t: cat_map[t]))
    )
    return F.when(F.size(cats) > 0, cats)


def categories_via_broadcast_join(
    df: DataFrame,
    blocklist: DataFrame,  # (term string, category string)
    id_col: str = "clip_id",
    content_col: str = "content",
) -> DataFrame:
    """General large-blocklist path: broadcast join on exploded tokens."""
    toks = df.select(
        F.col(id_col), F.explode(tokens_of(F.col(content_col))).alias("term")
    )
    hits = (
        toks.join(F.broadcast(blocklist), "term")
        .groupBy(id_col)
        .agg(F.array_sort(F.collect_set("category")).alias("categories"))
    )
    return df.join(hits, id_col, "left")


def load_ut1_dir(root: str) -> dict[str, str]:
    """Ingest a UT1-format blocklist directory tree — the layout the
    reference consumes (src/transformers/content_detector.rs:26-64 via
    the ut1_blocklist crate): one subdirectory per category, each
    holding newline-delimited ``domains`` / ``urls`` / ``expressions``
    files (we also accept ``terms`` for the audio adaptation). Every
    non-empty, non-comment line becomes a lowercased term mapped to
    its category, feeding the same term→category operators above —
    so a real UT1 download is drop-in.

    A term listed under several categories keeps the lexicographically
    first category (deterministic)."""
    import os

    out: dict[str, str] = {}
    for category in sorted(os.listdir(root)):
        cdir = os.path.join(root, category)
        if not os.path.isdir(cdir):
            continue
        for fname in ("domains", "urls", "expressions", "terms"):
            path = os.path.join(cdir, fname)
            if not os.path.exists(path):
                continue
            with open(path, encoding="utf-8", errors="replace") as f:
                for line in f:
                    term = line.strip().lower()
                    if not term or term.startswith("#"):
                        continue
                    out.setdefault(term, category)
    return out


def apply_blocklist(
    df: DataFrame,
    term_to_category: dict[str, str],
    content_col: str = "content",
) -> DataFrame:
    return df.withColumn(
        "categories", categories_from_terms(F.col(content_col), term_to_category)
    )
