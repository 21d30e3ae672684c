"""Registry batch 44 — cross-source plagiarism matrix and a rank-free
composite quality index.

The plagiarism matrix aggregates near-dup PAIRS by source pair —
within-source duplication is republication noise; CROSS-source
duplication is syndication/scraping and decides which feed to drop.
The composite index demonstrates rank-free score fusion: every signal
maps to a decile via broadcast thresholds (no global percent_rank
window over the corpus), then a weighted mean fuses them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datas_spark.functions.text import word_tokens
from datas_spark.io.sources import read_table
from datas_spark.operators import dedup as D
from datas_spark.registry_core import register

_PAIRS_CTE = r"""
    WITH sh AS (
      SELECT doc_id,
        list_distinct(list_transform(
          range(1, greatest(len(string_split_regex(trim(text), '\s+')) - 2, 0) + 1),
          i -> array_to_string((string_split_regex(trim(text), '\s+'))[i:i+2], ' ')))
          AS grams
      FROM documents
    ), ex AS (
      SELECT doc_id, len(grams) AS n, unnest(grams) AS s FROM sh
    ), pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.n AS na, b.n AS nb,
             count(*) AS shared
      FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2, 3, 4
      HAVING shared / (na + nb - shared) >= 0.2
    )
"""


@register(
    "cross_source_dup_matrix",
    oracle=_PAIRS_CTE
    + """
    SELECT least(da.source, db.source) AS src_lo,
           greatest(da.source, db.source) AS src_hi,
           count(*)::BIGINT AS n_pairs
    FROM pairs p
    JOIN documents da ON p.id_a = da.doc_id
    JOIN documents db ON p.id_b = db.doc_id
    WHERE da.source != db.source
    GROUP BY 1, 2
    """,
)
def q_cross_source_dup_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which feeds copy each other: near-dup pairs (n-gram Jaccard ≥
    0.2) whose endpoints live in DIFFERENT sources, aggregated into a
    canonical (src_lo, src_hi) matrix. Within-source pairs are
    excluded — republication inside one feed is a different problem
    than syndication across feeds.

    The pair frame is orders of magnitude smaller than the corpus;
    the two id→source joins broadcast the (id, source) projection per
    AQE, and the matrix is ≤ C(|sources|, 2) rows."""
    docs = read_table(spark, sf_dir, "documents")
    pairs = D.ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.2)
    sa = docs.select(F.col("doc_id").alias("id_a"), F.col("source").alias("__sa"))
    sb = docs.select(F.col("doc_id").alias("id_b"), F.col("source").alias("__sb"))
    return (
        pairs.join(sa, "id_a")
        .join(sb, "id_b")
        .where(F.col("__sa") != F.col("__sb"))
        .groupBy(
            F.least("__sa", "__sb").alias("src_lo"),
            F.greatest("__sa", "__sb").alias("src_hi"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
    )


_DECILES = [i / 10.0 for i in range(1, 10)]  # 9 interior cut points


@register(
    "composite_quality_index",
    oracle=r"""
    WITH sig AS (
      SELECT doc_id, n_chars::DOUBLE AS len_sig,
             len(string_split_regex(trim(text), '\s+'))::DOUBLE AS tok_sig,
             (len(list_distinct(string_split_regex(trim(lower(text)), '\s+')))::DOUBLE
              / len(string_split_regex(trim(text), '\s+'))) AS ttr_sig
      FROM documents
    ), thr AS (
      SELECT list_transform(quantile_cont(len_sig, [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]),
                            x -> round(x, 6)) AS t_len,
             list_transform(quantile_cont(tok_sig, [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]),
                            x -> round(x, 6)) AS t_tok,
             list_transform(quantile_cont(ttr_sig, [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]),
                            x -> round(x, 6)) AS t_ttr
      FROM sig
    )
    SELECT s.doc_id,
           (1 + len(list_filter(t.t_len, x -> s.len_sig > x)))::BIGINT AS d_len,
           (1 + len(list_filter(t.t_tok, x -> s.tok_sig > x)))::BIGINT AS d_tok,
           (1 + len(list_filter(t.t_ttr, x -> s.ttr_sig > x)))::BIGINT AS d_ttr,
           round(((1 + len(list_filter(t.t_len, x -> s.len_sig > x)))
                + (1 + len(list_filter(t.t_tok, x -> s.tok_sig > x)))
                + (1 + len(list_filter(t.t_ttr, x -> s.ttr_sig > x))))
                / 3.0, 6) AS composite
    FROM sig s CROSS JOIN thr t
    """,
)
def q_composite_quality_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-free composite quality index: three signals (length, token
    count, unique-token ratio) each map to a decile 1–10 by counting
    how many of NINE broadcast percentile cut points the value
    exceeds, and the composite is their mean. The fusion pattern that
    replaces a global percent_rank window (one reducer sorting the
    corpus, three times) with one percentile buffer per signal and a
    map-side expression — the difference between a day and a minute
    at 10⁹ docs.

    Cut points round to 6 dp before comparison (engine-identical
    decile membership, the repo's standard threshold discipline)."""
    docs = read_table(spark, sf_dir, "documents")
    toks = word_tokens("text")
    ttr = F.size(F.array_distinct(word_tokens(F.lower("text")))).cast(
        "double"
    ) / F.size(toks)
    sig = docs.select(
        "doc_id",
        F.col("n_chars").cast("double").alias("len_sig"),
        F.size(toks).cast("double").alias("tok_sig"),
        ttr.alias("ttr_sig"),
    )
    thr = sig.agg(
        *[
            F.array(
                *[
                    F.round(F.percentile(F.col(c), F.lit(p)), 6)
                    for p in _DECILES
                ]
            ).alias(f"t_{c[:3]}")
            for c in ("len_sig", "tok_sig", "ttr_sig")
        ]
    )

    def decile(sig_col: str, thr_col: str) -> F.Column:
        return (
            1
            + F.size(
                F.filter(F.col(thr_col), lambda x: F.col(sig_col) > x)
            )
        ).cast("long")

    d_len = decile("len_sig", "t_len")
    d_tok = decile("tok_sig", "t_tok")
    d_ttr = decile("ttr_sig", "t_ttr")
    return sig.crossJoin(F.broadcast(thr)).select(
        "doc_id",
        d_len.alias("d_len"),
        d_tok.alias("d_tok"),
        d_ttr.alias("d_ttr"),
        F.round((d_len + d_tok + d_ttr) / F.lit(3.0), 6).alias("composite"),
    )
