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
