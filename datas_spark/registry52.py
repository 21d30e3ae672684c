"""Registry batch 52 — ML label engineering and dedup diagnostics:
the churn label/feature builder (point-in-time correct) and the
near-dup component-size distribution.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datas_spark.io.sources import read_table
from datas_spark.operators import dedup as D
from datas_spark.oracle_shared import NEAR_DEDUP_RESOLVE_ORACLE
from datas_spark.registry_core import register

_CHURN_CUT = "2024-01-24"  # observation end; a purchase after = not churned


@register(
    "churn_label_features",
    oracle=f"""
    WITH feat AS (
      SELECT user_id,
             count(*) FILTER (WHERE event_type = 'purchase'
                              AND ts < TIMESTAMP '{_CHURN_CUT}')::BIGINT
               AS n_purchases_before,
             max(CASE WHEN event_type = 'purchase'
                      AND ts < TIMESTAMP '{_CHURN_CUT}' THEN ts END)
               AS last_purchase_before,
             count(*) FILTER (WHERE event_type = 'purchase'
                              AND ts >= TIMESTAMP '{_CHURN_CUT}')::BIGINT
               AS n_purchases_after
      FROM events GROUP BY user_id
    )
    SELECT user_id, n_purchases_before,
           date_diff('day', last_purchase_before,
                     TIMESTAMP '{_CHURN_CUT}')::BIGINT AS recency_days,
           CASE WHEN n_purchases_after = 0 THEN 1 ELSE 0 END AS churned
    FROM feat WHERE n_purchases_before > 0
    """,
)
def q_churn_label_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purchase-churn training-set builder, point-in-time correct:
    features (purchase count, recency) come ONLY from before the
    cutoff; the label (no purchase at or after it) only from after — the temporal wall
    that keeps label information out of the features, same discipline
    as `temporal_embargo_split`. One grouped pass with conditional
    aggregates; users unseen before the cutoff are excluded (no
    feature history to learn from)."""
    ev = read_table(spark, sf_dir, "events")
    cut = F.lit(_CHURN_CUT).cast("timestamp")
    is_p = F.col("event_type") == "purchase"
    before = is_p & (F.col("ts") < cut)
    after = is_p & (F.col("ts") >= cut)
    feat = ev.groupBy("user_id").agg(
        F.count(F.when(before, 1)).cast("long").alias("n_purchases_before"),
        F.max(F.when(before, F.col("ts"))).alias("__last"),
        F.count(F.when(after, 1)).cast("long").alias("__after"),
    )
    return feat.where(F.col("n_purchases_before") > 0).select(
        "user_id",
        "n_purchases_before",
        F.datediff(cut.cast("date"), F.col("__last").cast("date"))
        .cast("long")
        .alias("recency_days"),
        F.when(F.col("__after") == 0, 1).otherwise(0).alias("churned"),
    )


@register(
    "near_dup_component_sizes",
    oracle="WITH resolved AS ("
    + NEAR_DEDUP_RESOLVE_ORACLE
    + """
    ), sizes AS (
      SELECT component, count(*)::BIGINT AS size FROM resolved GROUP BY 1
    )
    SELECT size, count(*)::BIGINT AS n_components
    FROM sizes GROUP BY size
    """,
)
def q_near_dup_component_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup diagnostics: the size distribution of near-dup components
    (n-gram Jaccard ≥ 0.2 graph) — a healthy corpus is dominated by
    singletons with a thin tail of small clusters; a fat tail or one
    giant component means the threshold (or a hot template) is
    chaining unrelated docs, the classic near-dup failure mode that
    silently deletes half the corpus at resolve time. Two re-aggs of
    the resolve frame, each combinable."""
    docs = read_table(spark, sf_dir, "documents")
    pairs = D.ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.2)
    resolved = D.near_dedup_keep_first(docs, "doc_id", pairs)
    sizes = resolved.groupBy("component").agg(
        F.count(F.lit(1)).cast("long").alias("size")
    )
    return sizes.groupBy("size").agg(
        F.count(F.lit(1)).cast("long").alias("n_components")
    )
