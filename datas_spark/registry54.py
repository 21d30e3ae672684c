"""Registry batch 54 — set-similarity at index-free scale and feature
encodings: AllPairs/PPJoin prefix-filtered Jaccard (same output as the
full inverted index, prefix-only indexing), duplicated-n-gram coverage
(the linear-cost proxy for suffix-array substring dedup), leave-one-out
target encoding, and per-group robust scaling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datas_spark.io.sources import read_table
from datas_spark.operators import dedup as D
from datas_spark.operators import encoding as E
from datas_spark.registry_core import register

# Exact Jaccard pairs are candidate-generation independent: the oracle
# computes ALL pairs sharing >= 1 shingle directly, and the prefix
# filter (sound — Bayardo et al. WWW'07) must reproduce them exactly.
_PREFIX_JACCARD_ORACLE = r"""
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
    )
    SELECT id_a, id_b,
           round(shared / (na + nb - shared), 6) AS jaccard
    FROM pairs WHERE shared / (na + nb - shared) >= 0.8
"""


@register("jaccard_prefix_pairs", oracle=_PREFIX_JACCARD_ORACLE)
def q_jaccard_prefix_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard pairs at t=0.8 via prefix filtering: only
    each doc's |d|−⌈t·|d|⌉+1 globally-rarest shingles are indexed, so
    hot shingles (frequent ⇒ ordered last) fall out of the index and
    no recall-losing frequency cap is needed. Must hash-match the
    direct all-pairs oracle — the soundness proof made executable.

    t=0.8 is the operator's regime: the prefix is ~20% of each doc and
    rarest-first postings are near-empty. At permissive thresholds
    (t≈0.2) the prefix covers ~80% of the doc and the capped inverted
    index (`ngram_jaccard_pairs`) is the right tool — the two queries
    bench the two regimes side by side."""
    docs = read_table(spark, sf_dir, "documents")
    pairs = D.prefix_filter_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.8)
    return pairs.select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))


@register(
    "duplicate_ngram_coverage",
    oracle=r"""
    WITH sh AS (
      SELECT doc_id,
        list_distinct(list_transform(
          range(1, greatest(len(string_split_regex(trim(text), '\s+')) - 4, 0) + 1),
          i -> array_to_string((string_split_regex(trim(text), '\s+'))[i:i+4], ' ')))
          AS grams
      FROM documents
    ), ex AS (
      SELECT doc_id, unnest(grams) AS s FROM sh
    ), dfq AS (
      SELECT s, count(*) AS df FROM ex GROUP BY 1
    ), per AS (
      SELECT doc_id, count(*)::BIGINT AS n_grams,
             count(*) FILTER (df >= 2)::BIGINT AS dup_grams
      FROM ex JOIN dfq USING (s) GROUP BY 1
    )
    SELECT d.doc_id,
           coalesce(n_grams, 0) AS n_grams,
           coalesce(dup_grams, 0) AS dup_grams,
           round(CASE WHEN coalesce(n_grams, 0) > 0
                 THEN dup_grams::DOUBLE / n_grams ELSE 0.0 END, 6) AS dup_coverage
    FROM documents d LEFT JOIN per USING (doc_id)
    """,
)
def q_duplicate_ngram_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc fraction of distinct 5-grams that occur in >= 2 docs —
    the scalable stand-in for suffix-array substring dedup (Lee et al.
    2022): no pair generation, cost linear in shingle volume."""
    docs = read_table(spark, sf_dir, "documents")
    cov = D.duplicate_ngram_coverage(docs, "doc_id", "text", n=5)
    return cov.select(
        "doc_id", "n_grams", "dup_grams", F.round("dup_coverage", 6).alias("dup_coverage")
    )


@register(
    "segment_target_encoding",
    oracle="""
    WITH j AS (
      SELECT o_orderkey, c_mktsegment,
             CAST(round(o_totalprice * 100) AS BIGINT) AS pc
      FROM orders JOIN customer ON o_custkey = c_custkey
    ), pr AS (
      SELECT avg(pc) AS prior FROM j
    ), st AS (
      SELECT c_mktsegment, sum(pc)::BIGINT AS s, count(pc)::BIGINT AS c
      FROM j GROUP BY 1
    )
    SELECT o_orderkey, j.c_mktsegment,
           round(((s - pc + 20.0 * prior) / (c - 1 + 20.0)) / 100, 6) AS te
    FROM j JOIN st USING (c_mktsegment) CROSS JOIN pr
    """,
)
def q_segment_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out target encoding of the customer market segment
    against order value (exact integer-cents sums so the per-category
    aggregate is order-independent; the one double division is
    bit-reproducible). Each order's own price never leaks into its
    encoding — the training-feature hygiene rule as a plan."""
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    j = orders.join(cust, orders["o_custkey"] == cust["c_custkey"]).select(
        "o_orderkey",
        "c_mktsegment",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("pc"),
    )
    enc = E.loo_target_encode(j, "c_mktsegment", "pc", smoothing=20.0)
    return enc.select(
        "o_orderkey", "c_mktsegment", F.round(F.col("te") / 100, 6).alias("te")
    )


@register(
    "events_value_robust_scaled",
    oracle="""
    WITH st AS (
      SELECT event_type,
             quantile_cont(value, 0.5) AS med,
             quantile_cont(value, 0.25) AS p25,
             quantile_cont(value, 0.75) AS p75
      FROM events GROUP BY 1
    )
    SELECT event_id, e.event_type,
           round(CASE WHEN p75 - p25 > 0
                 THEN (value - med) / (p75 - p25) END, 6) AS scaled
    FROM events e JOIN st USING (event_type)
    WHERE event_id % 37 = 0
    """,
)
def q_events_value_robust_scaled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type robust scaling ((x − median)/IQR, exact
    linear-interpolation percentiles) — outlier-resistant feature
    normalization. The mod-37 slice bounds driver-compared output
    without touching any value boundary."""
    events = read_table(spark, sf_dir, "events")
    scaled = E.robust_scale(events, "value", by="event_type")
    return scaled.where(F.col("event_id") % 37 == 0).select(
        "event_id", "event_type", F.round("scaled", 6).alias("scaled")
    )
