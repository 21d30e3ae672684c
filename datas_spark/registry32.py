"""Registry batch 32 — dataset profiling and robustification: the
per-column stats profiler (the "DESCRIBE my lake table" every pipeline
runs before training), corpus mixture composition + entropy (the
multi-source balance screen), and percentile winsorization (robust
score clamping before normalization).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datas_spark.functions.text import token_count
from datas_spark.io.sources import read_table
from datas_spark.registry_core import register

_PROFILE_COLS = ["doc_id", "lang", "source", "n_chars"]


@register(
    "documents_column_profile",
    oracle="""
    SELECT 'doc_id' AS column_name, count(*)::BIGINT AS n_rows,
           count(*) FILTER (WHERE doc_id IS NULL)::BIGINT AS n_null,
           count(DISTINCT doc_id)::BIGINT AS n_distinct,
           min(doc_id)::VARCHAR AS min_value, max(doc_id)::VARCHAR AS max_value
    FROM documents
    UNION ALL
    SELECT 'lang', count(*)::BIGINT,
           count(*) FILTER (WHERE lang IS NULL)::BIGINT,
           count(DISTINCT lang)::BIGINT, min(lang), max(lang)
    FROM documents
    UNION ALL
    SELECT 'source', count(*)::BIGINT,
           count(*) FILTER (WHERE source IS NULL)::BIGINT,
           count(DISTINCT source)::BIGINT, min(source), max(source)
    FROM documents
    UNION ALL
    SELECT 'n_chars', count(*)::BIGINT,
           count(*) FILTER (WHERE n_chars IS NULL)::BIGINT,
           count(DISTINCT n_chars)::BIGINT,
           min(n_chars)::VARCHAR, max(n_chars)::VARCHAR
    FROM documents
    """,
)
def q_documents_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column table profile: row count, null count, exact distinct
    count, min/max (as strings, so one long-format frame covers mixed
    types) — the pre-training data-quality screen.

    Scale shape: ONE scan computes every column's stats in a single
    aggregate (Catalyst expands the multi-distinct into one Expand +
    aggregate pass — never k scans for k columns); the long format is
    a driver-free unpivot of the 1-row wide result. Exact distincts
    are the oracle-checkable contract at test scale; at 100 TB swap
    ``approx_count_distinct`` per column — same single-pass plan,
    sketch-sized state."""
    docs = read_table(spark, sf_dir, "documents")
    aggs = []
    for c in _PROFILE_COLS:
        aggs += [
            F.count(F.lit(1)).cast("long").alias(f"{c}__rows"),
            F.count(F.when(F.col(c).isNull(), 1)).cast("long").alias(f"{c}__null"),
            F.count_distinct(F.col(c)).cast("long").alias(f"{c}__dist"),
            F.min(F.col(c)).cast("string").alias(f"{c}__min"),
            F.max(F.col(c)).cast("string").alias(f"{c}__max"),
        ]
    wide = docs.agg(*aggs)
    long = F.array(
        *[
            F.struct(
                F.lit(c).alias("column_name"),
                F.col(f"{c}__rows").alias("n_rows"),
                F.col(f"{c}__null").alias("n_null"),
                F.col(f"{c}__dist").alias("n_distinct"),
                F.col(f"{c}__min").alias("min_value"),
                F.col(f"{c}__max").alias("max_value"),
            )
            for c in _PROFILE_COLS
        ]
    )
    return wide.select(F.explode(long).alias("p")).select("p.*")


@register(
    "corpus_mixture_stats",
    oracle=r"""
    WITH per_source AS (
      SELECT source, count(*)::BIGINT AS n_docs,
             sum(len(list_filter(
               string_split_regex(trim(regexp_replace(lower(text),
                 '([^\w\s])', ' \1 ', 'g')), '\s+'), t -> t != '')))::BIGINT
               AS n_tokens
      FROM documents GROUP BY 1
    ), tot AS (
      SELECT sum(n_tokens)::BIGINT AS total_tokens FROM per_source
    )
    SELECT p.source, p.n_docs, p.n_tokens,
           round(p.n_tokens::DOUBLE / t.total_tokens::DOUBLE * 100, 6)
             AS token_share_pct
    FROM per_source p CROSS JOIN tot t
    """,
)
def q_corpus_mixture_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus mixture composition: docs, BPE-ish tokens, and token
    share per source — the table a mixture designer reads before
    setting sampling weights (`token_budget_mixture` consumes exactly
    these numbers).

    One tokenize pass, one combinable per-source aggregate, a 1-row
    broadcast total; shares divide exact integers once."""
    docs = read_table(spark, sf_dir, "documents")
    per_source = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(token_count("text")).cast("long").alias("n_tokens"),
    )
    tot = per_source.agg(F.sum("n_tokens").cast("long").alias("total_tokens"))
    return per_source.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "n_tokens",
        F.round(
            F.col("n_tokens").cast("double")
            / F.col("total_tokens").cast("double")
            * 100,
            6,
        ).alias("token_share_pct"),
    )


@register(
    "corpus_mixture_entropy",
    oracle=r"""
    WITH per_source AS (
      SELECT source,
             sum(len(list_filter(
               string_split_regex(trim(regexp_replace(lower(text),
                 '([^\w\s])', ' \1 ', 'g')), '\s+'), t -> t != '')))::BIGINT
               AS n_tokens
      FROM documents GROUP BY 1
    ), tot AS (
      SELECT sum(n_tokens)::BIGINT AS total FROM per_source
    )
    SELECT count(*)::BIGINT AS n_sources,
           max(t.total)::BIGINT AS total_tokens,
           round(sum(CASE WHEN p.n_tokens > 0 THEN
             -(p.n_tokens::DOUBLE / t.total::DOUBLE)
               * ln(p.n_tokens::DOUBLE / t.total::DOUBLE) ELSE 0 END), 6)
             AS token_entropy_nats
    FROM per_source p CROSS JOIN tot t
    """,
)
def q_corpus_mixture_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture balance in one number: Shannon entropy (nats) of the
    per-source token distribution. ln(n_sources) = perfectly balanced;
    near 0 = one source dominates. Exact integer token counts; the
    entropy sums ≤ |sources| float terms in a tiny final aggregate."""
    docs = read_table(spark, sf_dir, "documents")
    per_source = docs.groupBy("source").agg(
        F.sum(token_count("text")).cast("long").alias("n_tokens")
    )
    tot = per_source.agg(F.sum("n_tokens").cast("long").alias("total"))
    p = F.col("n_tokens").cast("double") / F.col("total").cast("double")
    return (
        per_source.crossJoin(F.broadcast(tot))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_sources"),
            F.max("total").cast("long").alias("total_tokens"),
            F.round(
                F.sum(F.when(F.col("n_tokens") > 0, -p * F.log(p)).otherwise(0.0)),
                6,
            ).alias("token_entropy_nats"),
        )
    )


@register(
    "winsorized_doc_lengths",
    oracle="""
    WITH thr AS (
      SELECT round(quantile_cont(n_chars::DOUBLE, 0.05), 6) AS lo,
             round(quantile_cont(n_chars::DOUBLE, 0.95), 6) AS hi
      FROM documents
    )
    SELECT d.doc_id, d.n_chars,
           round(least(greatest(d.n_chars::DOUBLE, t.lo), t.hi), 6)
             AS n_chars_winsorized
    FROM documents d CROSS JOIN thr t
    """,
)
def q_winsorized_doc_lengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percentile winsorization: clamp a heavy-tailed feature into its
    [p5, p95] band before normalization — the robust alternative to
    dropping outliers (`events_value_outliers` flags; this repairs).

    One combinable percentile buffer → 1-row broadcast thresholds →
    map-side clamp; thresholds rounded to 6 dp pre-comparison so band
    membership is engine-identical."""
    docs = read_table(spark, sf_dir, "documents")
    thr = docs.agg(
        F.round(F.percentile(F.col("n_chars").cast("double"), F.lit(0.05)), 6).alias(
            "lo"
        ),
        F.round(F.percentile(F.col("n_chars").cast("double"), F.lit(0.95)), 6).alias(
            "hi"
        ),
    )
    return docs.crossJoin(F.broadcast(thr)).select(
        "doc_id",
        "n_chars",
        F.round(
            F.least(
                F.greatest(F.col("n_chars").cast("double"), F.col("lo")),
                F.col("hi"),
            ),
            6,
        ).alias("n_chars_winsorized"),
    )
