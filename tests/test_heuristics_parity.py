"""Property-style parity: the Catalyst heuristic stages must agree
cell-for-cell with the pure-Python oracle transcribed from the Rust
reference (SURVEY.md §5 / §7 "hard parts" #1).

Covers the documented divergence traps: bytes-vs-codepoints
(multibyte lines), > vs >= boundaries at exactly 99/100/101
codepoints, float->int truncation, \r\n handling, trailing newlines,
empty docs.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from ungoliant_spark import oracle
from ungoliant_spark.operators.annotators import apply_annotators
from ungoliant_spark.operators.pfilter import apply_pfilter
from ungoliant_spark.operators.scrub import apply_scrub
from ungoliant_spark.operators.trim import apply_trim

LONG = "x" * 101  # keep boundary is chars > 100
EXACT100 = "y" * 100  # short for Length, upper bucket for PFilter
SHORT = "short line"
MULTIBYTE_99 = "é" * 99  # 99 codepoints / 198 bytes: short for Length,
#                           but NOT header-short (bytes >= 100)
MULTIBYTE_101 = "ü" * 101
NOISY_LINE = "!@#$%^&*()" * 15
MALAYALAM = "മലയാളം" * 30  # letters+combining marks → not noisy

CASES = [
    "",
    "\n",
    "\r\n",
    SHORT,
    LONG,
    EXACT100,
    LONG + "\n",
    f"{SHORT}\n{LONG}\n{SHORT}",
    f"{SHORT}\n{SHORT}\n{SHORT}",
    f"{LONG}\n{SHORT}\n{LONG}",
    f"{LONG}\r\n{SHORT}\r\n{LONG}\r\n",
    f"{EXACT100}\n{LONG}\n{EXACT100}",
    f"{MULTIBYTE_99}\n{LONG}\n{MULTIBYTE_99}",
    f"{MULTIBYTE_101}\n{SHORT}\n{MULTIBYTE_101}",
    f"{NOISY_LINE}\n{LONG}\n{NOISY_LINE}",
    f"{MALAYALAM}\n{MALAYALAM}",
    "\n".join([LONG] * 12),
    "\n".join([SHORT] * 12 + [LONG] * 3),
    "\n".join([LONG] * 3 + [SHORT] * 12),
    "\n".join([SHORT, LONG, SHORT, LONG, SHORT]),
    f"{LONG}\n" + "\n".join([SHORT] * 9) + f"\n{LONG}",
    NOISY_LINE + "\n" + NOISY_LINE * 12,
    "a\n\nb\n\n" + LONG,
    "a\n\n",  # Java '$'-before-final-newline trap: must keep ["a", ""]
    LONG + "\n\n",
    f"{LONG}\n\n{LONG}\n\n",
    "Write to john.doe+x@example.co.uk or 10.0.0.1 now " + LONG,
    "Call +33 6 12 34 56 78 or (555) 123-4567. " + LONG,
    # bare trailing '\r' (no '\n' after): Rust keeps it — only '\r'
    # that directly precedes '\n' is stripped
    "a\r",
    LONG + "\r",
    f"{LONG}\r\n{LONG}\r",
    f"{LONG}\r\n{SHORT}\r",
    "a\r\n",
]


def _random_cases(n=200, seed=42):
    rng = random.Random(seed)
    pieces = [SHORT, LONG, EXACT100, MULTIBYTE_99, NOISY_LINE, "", "a", "é" * 50]
    out = []
    for _ in range(n):
        k = rng.randint(1, 14)
        body = "\n".join(rng.choice(pieces) for _ in range(k))
        if rng.random() < 0.3:
            body += "\n"
        out.append(body)
    return out


ALL = CASES + _random_cases()


@pytest.fixture(scope="module")
def result_rows(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(ALL)], "id long, transcript string"
    )
    df = apply_trim(df)
    df = apply_pfilter(df)
    df = apply_annotators(df)
    df = apply_scrub(df)
    rows = {r["id"]: r for r in df.collect()}
    return rows


def test_parity(result_rows):
    for i, text in enumerate(ALL):
        exp = oracle.heuristic_pipeline(text)
        got = result_rows[i]
        assert got["trim_keep"] == exp.trim_keep, (i, repr(text[:80]))
        assert got["line_start"] == exp.line_start, (i, repr(text[:80]))
        assert got["line_end"] == exp.line_end, (i, repr(text[:80]))
        assert got["content"] == exp.content, (i, repr(text[:80]))
        if exp.trim_keep:
            assert got["pfilter_keep"] == exp.pfilter_keep, (i, repr(text[:80]))
            if exp.pfilter_keep:
                assert (
                    list(got["quality_warnings"]) == exp.quality_warnings
                ), (i, repr(text[:80]))
                assert got["annotation_keep"] == exp.annotation_keep
                assert got["scrubbed"] == oracle.scrub(exp.content)


def test_rust_lines_semantics(spark):
    """Ground truth straight from Rust str::lines() documentation:
    '\\r' is stripped only when it directly precedes '\\n'."""
    from ungoliant_spark.functions.lines import rust_lines

    cases = [
        ("", []),
        ("\n", [""]),
        ("\r\n", [""]),
        ("a\r", ["a\r"]),          # bare final CR survives
        ("a\r\n", ["a"]),
        ("a\r\nb\r", ["a", "b\r"]),
        ("a\rb\nc", ["a\rb", "c"]),  # interior CR not at segment end
        ("a\n\n", ["a", ""]),
        ("a\r\n\r\n", ["a", ""]),
    ]
    for text, expected in cases:
        assert oracle.rust_lines(text) == expected, repr(text)
    df = spark.createDataFrame(
        [(i, t) for i, (t, _) in enumerate(cases)], "id long, text string"
    )
    got = {
        r["id"]: r["lines"]
        for r in df.select("id", rust_lines(F.col("text")).alias("lines")).collect()
    }
    for i, (text, expected) in enumerate(cases):
        assert got[i] == expected, repr(text)


def test_scrub_examples(spark):
    cases = [
        ("mail a@b.io now", "mail <EMAIL> now"),
        ("ip 192.168.0.255 end", "ip <IP> end"),
        ("v6 2001:0db8:85a3:0000:0000:8a2e:0370:7334 end", "v6 <IP> end"),
        ("call (555) 123-4567 end", "call <PHONE> end"),
        ("call +33 6 12 34 56 78 end", "call <PHONE> end"),
        ("no pii here 12 34", "no pii here 12 34"),
    ]
    df = spark.createDataFrame(cases, "content string, expected string")
    out = apply_scrub(df).collect()
    for r in out:
        assert r["scrubbed"] == r["expected"], r["content"]
        assert oracle.scrub(r["content"]) == r["expected"]


# three-way scrub parity corpus: every engine that runs the frozen PII
# chain, on the traps where regex dialects differ — unicode digits
# (\d is ASCII in Java and RE2; the Python twin rewrites \d→[0-9]),
# single-pass residue, placeholder adjacency, multiline input
PII_AGREE_CASES = [
    "",
    "no pii here",
    "reach me at bob.smith+tag@example.co.uk today",
    "a@b.cc@d.ee",           # chain is single-pass: residue stays
    "<EMAIL>@x.com",         # token-adjacency trap
    "ip 10.0.0.1 and 999.999.999.999 end",
    "1.2.3.4.5.6.7.8",
    "fe80::1",
    "2001:0db8:85a3:0000:0000:8a2e:0370:7334",
    "call 555.123.4567 now",
    "(555) 123-4567",
    "+1 (555) 123-4567",
    "+44 20 7946 0958",
    "call ٥٥٥.١٢٣.٤٥٦٧ now",   # Arabic-Indic digits: \d matches in NO engine
    "ip ١.٢.٣.٤ here",
    "５５５.１２３.４５６７",      # fullwidth digits: same
    "x55.123.4567",
    "mixed ٥55.123.4567 tail",
    "é5.123.4567 phone?",
    "call\n555.123.4567 x",
]

# the KNOWN \b dialect split: Java's \b is unicode-aware even though
# its \w/\d are ASCII (a documented Java quirk the Python twin shares
# via default-unicode \b), while RE2's \b is ASCII — so a digit run
# glued to a non-ASCII word character is "embedded in a word" to the
# production engine and the twin, but boundary-delimited to the DuckDB
# oracle. (scrubbed_spark == scrubbed_twin, duckdb differs as pinned.)
PII_JAVA_B_DIVERGENCE = [
    ("café1.2.3.4", "café1.2.3.4", "café<IP>"),
    ("١1.2.3.4", "١1.2.3.4", "١<IP>"),
    ("1.2.3.4é", "1.2.3.4é", "<IP>é"),
]


def test_scrub_three_way_parity(spark):
    """The frozen PII chain means the SAME THING in Spark (Java
    regex), the DuckDB oracle (RE2), and the pure-Python label twin
    on the shared domain — and where the dialects genuinely split
    (unicode word chars against \\b), the exact divergence is pinned
    per engine so silent drift in ANY of the three is caught."""
    import duckdb

    from ungoliant_spark.operators.scrub import scrub_sql

    cases = PII_AGREE_CASES + [c for c, _, _ in PII_JAVA_B_DIVERGENCE]
    df = spark.createDataFrame(
        list(enumerate(cases)), "i int, content string"
    )
    got_spark = {r.i: r.scrubbed for r in apply_scrub(df).collect()}
    con = duckdb.connect()
    con.execute("create table t(i int, content varchar)")
    con.executemany("insert into t values (?, ?)", list(enumerate(cases)))
    got_duck = dict(
        con.execute(f"select i, {scrub_sql('content')} from t").fetchall()
    )
    for i, s in enumerate(PII_AGREE_CASES):
        py = oracle.scrub(s)
        assert got_spark[i] == py == got_duck[i], (
            i, repr(s), got_spark[i], py, got_duck[i],
        )
    base = len(PII_AGREE_CASES)
    for k, (s, want_engine, want_duck) in enumerate(PII_JAVA_B_DIVERGENCE):
        i = base + k
        assert got_spark[i] == oracle.scrub(s) == want_engine, repr(s)
        assert got_duck[i] == want_duck, repr(s)
