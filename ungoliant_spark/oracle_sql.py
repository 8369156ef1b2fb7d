"""DuckDB oracle SQL — the ANSI-SQL twins of the driver queries.

Each SQL string recomputes the reference semantics independently in
DuckDB over the same parquet views, so a value-hash match is evidence
the Catalyst expressions implement the Rust rules, not merely that
Spark agrees with itself.

SQL restrictions honored here: RE2 regex (no lookaround), DuckDB list
lambdas, 1-based list slicing.
"""

from __future__ import annotations

from ungoliant_spark.operators.scrub import scrub_sql

# Rust str::lines() over `text` (NULL/'' → zero lines). '\r' is
# stripped only where it preceded a '\n': every segment but the last,
# and the last too iff the text ended with '\n' (a bare trailing
# '\r' survives, matching Rust's strip-\n-then-strip-\r order).
_SPLIT_NO_NL = (
    "string_split(CASE WHEN text LIKE '%' || chr(10) "
    "THEN substr(text, 1, length(text) - 1) ELSE text END, chr(10))"
)
_LINES = f"""
CASE WHEN text IS NULL OR text = '' THEN []::VARCHAR[]
ELSE list_transform(
  {_SPLIT_NO_NL},
  (x, i) -> CASE WHEN x LIKE '%' || chr(13)
                  AND (i < len({_SPLIT_NO_NL})
                       OR text LIKE '%' || chr(10))
            THEN substr(x, 1, length(x) - 1) ELSE x END)
END
"""

# base CTE: lines + 0-based inclusive trim bounds + kept lines + content
_BASE = f"""
WITH lined AS (
  SELECT doc_id, source, ({_LINES}) AS lines
  FROM documents
), masked AS (
  SELECT doc_id, source, lines,
    NULLIF(list_position(list_transform(lines, x -> length(x) > 100), true), 0) AS first_pos,
    CASE WHEN NULLIF(list_position(list_transform(lines, x -> length(x) > 100), true), 0) IS NOT NULL
         THEN len(lines) - list_position(list_transform(list_reverse(lines), x -> length(x) > 100), true) + 1
    END AS last_pos
  FROM lined
), trimmed AS (
  SELECT doc_id, source,
    first_pos IS NOT NULL AS trim_keep,
    CAST(first_pos - 1 AS INTEGER) AS line_start,
    CAST(last_pos - 1 AS INTEGER) AS line_end,
    CASE WHEN first_pos IS NOT NULL THEN lines[first_pos:last_pos]
         ELSE []::VARCHAR[] END AS kept
  FROM masked
), scored AS (
  SELECT doc_id, source, trim_keep, line_start, line_end, kept,
    COALESCE(array_to_string(kept, chr(10)), '') AS content,
    COALESCE(list_sum(list_transform(kept,
      x -> CASE WHEN length(x) >= 100 THEN length(x) ELSE 0 END)), 0) AS upper_b,
    COALESCE(list_sum(list_transform(kept, x -> length(x))), 0) AS total_b
  FROM trimmed
), pf AS (
  SELECT *, NOT (CAST(upper_b AS DOUBLE) < 0.6 * CAST(total_b AS DOUBLE)) AS pfilter_keep
  FROM scored
), ann AS (
  SELECT *,
    len(kept) < 5 AS a_tiny,
    len(list_filter(kept, x -> length(x) <= 100)) >
      CAST(floor(0.5 * len(kept)) AS BIGINT) AS a_short,
    len(list_filter(kept[1:CAST(floor(len(kept) * 0.2) AS INTEGER)],
        x -> strlen(x) < 100)) >
      CAST(floor(floor(len(kept) * 0.2) * 0.5) AS BIGINT) AS a_header,
    len(list_filter(list_reverse(kept)[1:CAST(floor(len(kept) * 0.2) AS INTEGER)],
        x -> strlen(x) < 100)) >
      CAST(floor(floor(len(kept) * 0.2) * 0.5) AS BIGINT) AS a_footer,
    (length(content) - length(regexp_replace(content, '[^\\p{{L}}\\p{{M}}]', '', 'g'))) >
      CAST(floor(0.5 * length(content)) AS BIGINT) AS a_noisy
  FROM pf
), warned AS (
  SELECT *,
    list_filter([
      CASE WHEN a_tiny THEN 'tiny' END,
      CASE WHEN a_short THEN 'short_sentences' END,
      CASE WHEN a_header THEN 'header' END,
      CASE WHEN a_footer THEN 'footer' END,
      CASE WHEN a_noisy THEN 'noisy' END
    ], x -> x IS NOT NULL) AS warnings
  FROM ann
), final AS (
  SELECT *,
    NOT (list_sort(warnings) = ['noisy', 'tiny']) AS annotation_keep,
    (trim_keep AND pfilter_keep AND
     NOT (list_sort(warnings) = ['noisy', 'tiny'])) AS keep
  FROM warned
)
"""


def oracle_trim_bounds() -> str:
    return (
        _BASE
        + "SELECT doc_id, trim_keep, line_start, line_end, content FROM final"
    )


def oracle_pfilter() -> str:
    return _BASE + "SELECT doc_id, pfilter_keep FROM final WHERE trim_keep"


def oracle_quality_annotations() -> str:
    return (
        _BASE
        + """SELECT doc_id, array_to_string(warnings, ',') AS warnings,
      annotation_keep FROM final WHERE trim_keep AND pfilter_keep"""
    )


def oracle_heuristic_keep() -> str:
    return (
        _BASE
        + f"""SELECT doc_id, keep,
      CASE WHEN keep THEN {scrub_sql('content')} END AS scrubbed
      FROM final"""
    )


def oracle_pii_scrub() -> str:
    return (
        f"SELECT doc_id, {scrub_sql('text')} AS scrubbed FROM documents"
    )


def oracle_meanlength() -> str:
    """MeanLength flags: prefix mean/population-std INCLUDING the
    current line (update-then-test). All sums are over integer
    codepoint lengths, so double arithmetic is exact and the strict
    '<' agrees bit-for-bit with the engine. mean² is written as
    mean*mean (pow() could differ in the last ulp)."""
    mean = "(list_sum(lens[1:i]) / i)"
    powd = "(list_sum(list_transform(lens[1:i], v -> v * v)) / i)"
    return f"""
WITH lined AS (
  SELECT doc_id, list_transform(({_LINES}), x -> length(x)::DOUBLE) AS lens
  FROM documents
)
SELECT doc_id,
  COALESCE(array_to_string(
    list_transform(lens, (x, i) ->
      CASE WHEN abs(x - {mean}) < sqrt({powd} - {mean} * {mean})
           THEN '1' ELSE '0' END),
    ','), '') AS flags
FROM lined
"""


def oracle_conv_trim(conv_size: int = 5, min_length: float = 100.0) -> str:
    """Conv trimmer: window-5 moving average over BYTE lengths
    (strlen), edge-padded, trim both ends while conv < 100. Double
    math here equals the engine's f32 math because every intermediate
    (byte counts, window sums) is an exact small integer and x/5
    cannot straddle the 100.0 boundary between f32 and f64 for
    integer x (only x=500 hits it, exactly, in both)."""
    pad = conv_size // 2
    pad_start = "[" + ", ".join(["ls[1]"] * pad) + "]"
    pad_end = "[" + ", ".join(["ls[-1]"] * pad) + "]"
    return f"""
WITH lined AS (
  SELECT doc_id, ({_LINES}) AS lines FROM documents
), lens AS (
  SELECT doc_id, lines,
    list_transform(lines, x -> strlen(x)::DOUBLE) AS ls
  FROM lined
), padded AS (
  SELECT doc_id, lines, ls,
    list_concat(list_concat({pad_start}, ls), {pad_end}) AS pl
  FROM lens
), conv AS (
  SELECT doc_id, lines,
    list_transform(ls, (x, i) ->
      list_sum(pl[i:i+{conv_size - 1}]) / {conv_size}) AS cv
  FROM padded
), flagged AS (
  SELECT doc_id, lines,
    list_transform(cv, c -> c >= {min_length}) AS ok
  FROM conv
), bounds AS (
  SELECT doc_id, lines,
    NULLIF(list_position(ok, true), 0) AS first_pos,
    CASE WHEN NULLIF(list_position(ok, true), 0) IS NOT NULL
         THEN len(ok) - list_position(list_reverse(ok), true) + 1
    END AS last_pos
  FROM flagged
)
SELECT doc_id,
  CAST(first_pos - 1 AS INTEGER) AS line_start,
  CAST(last_pos - 1 AS INTEGER) AS line_end,
  CASE WHEN first_pos IS NOT NULL
       THEN array_to_string(lines[first_pos:last_pos], chr(10))
       ELSE '' END AS content
FROM bounds
"""


def oracle_keep_stats() -> str:
    return (
        _BASE
        + """SELECT source,
      CAST(count(*) AS BIGINT) AS n_docs,
      CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
      CAST(sum(CASE WHEN trim_keep THEN 1 ELSE 0 END) AS BIGINT) AS n_trim_keep,
      CAST(sum(CASE WHEN trim_keep AND pfilter_keep THEN 1 ELSE 0 END) AS BIGINT) AS n_pfilter_keep
      FROM final GROUP BY source"""
    )
