r"""PII scrub — rewrite transcripts replacing emails / IPs / phone
numbers with fixed placeholder tokens.

Required by the north_rule; the reference version at /root/reference
has no PII module (verified: no pii/regex-scrub hits in src/) — the
pass mirrors the regex annotation described for OSCAR 22.01 (Abadji
et al. 2022, "Towards a Cleaner Document-Oriented Multilingual
Crawled Corpus", §3). The regexes below are the FROZEN spec for this
repo (FIXTURES.md §3.8): they are deliberately restricted to syntax
with identical semantics in Java regex (Spark) and RE2 (DuckDB
oracle): no backreferences, no lookaround, greedy quantifiers only.

One dialect split survives that restriction and is pinned rather than
papered over: ``\b``. Java's ``\b`` is unicode-aware even though its
``\w``/``\d`` are ASCII (so ``café1.2.3.4`` has NO boundary before
the 1 — the digits are "embedded in a word" and not scrubbed), while
RE2's ``\b`` is ASCII (boundary → scrubbed). The production semantics
are Java's; the Python label twin (oracle.scrub) reproduces them
exactly (``\d``→``[0-9]`` + default-unicode ``\b``); the DuckDB
oracle is authoritative only on the shared domain, and the exact
divergence cases are pinned per-engine in
tests/test_heuristics_parity.py::test_scrub_three_way_parity.

Spark-first: a chain of ``regexp_replace`` Catalyst expressions —
zero Python, whole-stage codegen. The audio ``bytes`` column is never
touched (north_rule PCM-passthrough invariant).

Order matters and is frozen: EMAIL → IPv4 → IPv6 → PHONE. The
placeholders contain no digits, so the phone pass cannot re-match
inside an earlier replacement.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ungoliant_spark.config import PII_EMAIL_TOKEN, PII_IP_TOKEN, PII_PHONE_TOKEN

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b(?:\d{1,3}\.){3}\d{1,3}\b"
IPV6_RE = r"\b(?:[0-9A-Fa-f]{1,4}:){2,7}[0-9A-Fa-f]{1,4}\b"
# international (+CC ...) and US-style (NNN) NNN-NNNN / NNN.NNN.NNNN forms
PHONE_INTL_RE = r"\+\d{1,3}(?:[- .]?\(?\d{1,4}\)?){2,6}"
PHONE_US_RE = r"\(?\d{3}\)?[- .]\d{3}[- .]\d{4}"

# (pattern, replacement) in frozen application order
SCRUB_CHAIN = [
    (EMAIL_RE, PII_EMAIL_TOKEN),
    (IPV4_RE, PII_IP_TOKEN),
    (IPV6_RE, PII_IP_TOKEN),
    (PHONE_INTL_RE, PII_PHONE_TOKEN),
    (PHONE_US_RE, PII_PHONE_TOKEN),
]


def scrub(text: Column) -> Column:
    """Apply the frozen PII regexp_replace chain to a string column."""
    out = text
    for pattern, token in SCRUB_CHAIN:
        out = F.regexp_replace(out, pattern, token)
    return out


def scrub_sql(expr: str) -> str:
    """The same chain as ANSI SQL (DuckDB RE2) over a column expression —
    used by the oracle so both engines run literally the same spec."""
    out = expr
    for pattern, token in SCRUB_CHAIN:
        p = pattern.replace("'", "''")
        out = f"regexp_replace({out}, '{p}', '{token}', 'g')"
    return out


def apply_scrub(df: DataFrame, content_col: str = "content") -> DataFrame:
    return df.withColumn("scrubbed", scrub(F.col(content_col)))
