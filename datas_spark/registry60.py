"""Registry batch 60 — Gopher quality rules (the public heuristic set),
zlib compression-ratio feature (rows-only by design: not
SQL-expressible), and the l-diversity privacy audit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datas_spark.io.sources import read_table
from datas_spark.operators import corpus as C
from datas_spark.operators import validate as V
from datas_spark.registry_core import register

_TOKS = r"string_split_regex(trim(text), '\s+')"
_LINES = r"string_split(text, chr(10))"


@register(
    "gopher_quality_flags",
    oracle=rf"""
    WITH t AS (
      SELECT doc_id, text,
        len(list_filter({_TOKS}, x -> x != '')) AS n_words,
        list_sum(list_transform({_TOKS}, x -> length(x))) AS word_chars,
        length(text) - length(replace(text, '#', ''))
          + len(regexp_extract_all(text, '\.\.\.|…')) AS n_symbols,
        len({_LINES}) AS n_lines,
        len(list_filter({_LINES},
            x -> regexp_matches(trim(x), '^([-*•]|[0-9]+[.)])\s'))) AS bullet_lines,
        len(list_filter({_LINES},
            x -> regexp_matches(trim(x), '(\.\.\.|…)$'))) AS ellipsis_lines,
        len(list_filter({_TOKS}, x -> regexp_matches(x, '[A-Za-z]'))) AS alpha_words,
        list_sum(list_transform(
          ['the','be','to','of','and','that','have','with'],
          s -> CASE WHEN contains(' ' || lower(text) || ' ', ' ' || s || ' ')
               THEN 1 ELSE 0 END)) AS stop_hits
      FROM documents
    )
    SELECT doc_id, n_words::BIGINT AS n_words,
      (n_words < 50 OR n_words > 100000) AS flag_word_count,
      coalesce(CASE WHEN n_words > 0
        THEN (word_chars / n_words < 3.0 OR word_chars / n_words > 10.0) END,
        TRUE) AS flag_word_len,
      coalesce(n_symbols / n_words > 0.1, TRUE) AS flag_symbol_ratio,
      coalesce(bullet_lines / n_lines > 0.9, TRUE) AS flag_bullet_lines,
      coalesce(ellipsis_lines / n_lines > 0.3, TRUE) AS flag_ellipsis_lines,
      coalesce(alpha_words / n_words < 0.8, TRUE) AS flag_alpha_words,
      (stop_hits < 2) AS flag_stopwords,
      (NOT (n_words < 50 OR n_words > 100000)
       AND NOT coalesce(CASE WHEN n_words > 0
         THEN (word_chars / n_words < 3.0 OR word_chars / n_words > 10.0) END,
         TRUE)
       AND NOT coalesce(n_symbols / n_words > 0.1, TRUE)
       AND NOT coalesce(bullet_lines / n_lines > 0.9, TRUE)
       AND NOT coalesce(ellipsis_lines / n_lines > 0.3, TRUE)
       AND NOT coalesce(alpha_words / n_words < 0.8, TRUE)
       AND NOT (stop_hits < 2)) AS gopher_pass
    FROM t
    """,
)
def q_gopher_quality_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Gopher corpus-quality rule set (Rae et al. 2021 — the public
    heuristics RedPajama/Dolma/FineWeb reuse) as one map-side pass:
    per-rule violation flags + overall pass."""
    docs = read_table(spark, sf_dir, "documents")
    out = C.gopher_quality_flags(docs, "doc_id", "text")
    return out.select(
        "doc_id",
        "n_words",
        "flag_word_count",
        "flag_word_len",
        "flag_symbol_ratio",
        "flag_bullet_lines",
        "flag_ellipsis_lines",
        "flag_alpha_words",
        "flag_stopwords",
        "gopher_pass",
    )


@register("doc_compression_ratio")  # rows-only BY DESIGN: stdlib zlib
def q_doc_compression_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """zlib compression ratio per doc via Arrow-batched mapInPandas —
    the redundancy signal quality filters cut on. Not SQL-expressible
    (DuckDB has no zlib), so this is a rows-only check; the
    surrounding plumbing is pytest-proven with hand examples."""
    docs = read_table(spark, sf_dir, "documents")
    return C.compression_ratio(docs, "doc_id", "text")


@register(
    "customer_l_diversity",
    oracle="""
    WITH g AS (
      SELECT c_nationkey, c_mktsegment, count(*)::BIGINT AS n,
             (count(DISTINCT c_acctbal)
              + max(CASE WHEN c_acctbal IS NULL THEN 1 ELSE 0 END))::BIGINT AS d
      FROM customer GROUP BY 1, 2
    )
    SELECT 2::BIGINT AS l_required,
           min(d)::BIGINT AS min_distinct,
           count(*)::BIGINT AS n_groups,
           count(*) FILTER (d < 2)::BIGINT AS groups_below,
           sum(n)::BIGINT AS n_rows,
           sum(CASE WHEN d < 2 THEN n ELSE 0 END)::BIGINT AS rows_at_risk,
           round(sum(CASE WHEN d < 2 THEN n ELSE 0 END) / sum(n)::DOUBLE * 100, 6)
             AS at_risk_pct
    FROM g
    """,
)
def q_customer_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit of account balances within (nation, segment)
    quasi-identifier groups — the disclosure check k-anonymity misses
    (a uniform group is anonymous but fully disclosing)."""
    cust = read_table(spark, sf_dir, "customer")
    return V.l_diversity(cust, ["c_nationkey", "c_mktsegment"], "c_acctbal", l=2)
