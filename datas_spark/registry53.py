"""Registry batch 53 — item-item collaborative filtering: co-visitation
similarity over the per-user item baskets (items = the ``props.k``
payload of view events). The "users who engaged with X also engaged
with Y" primitive behind every related-items shelf.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from datas_spark.io.sources import read_table
from datas_spark.registry_core import register

_CF_TOPK = 5
_CF_MIN_CO = 3


@register(
    "item_covisitation_topk",
    oracle=f"""
    WITH baskets AS (
      SELECT DISTINCT user_id, json_extract(props, '$.k')::INT AS item
      FROM events WHERE event_type = 'view'
    ), item_n AS (
      SELECT item, count(*)::BIGINT AS n FROM baskets GROUP BY 1
    ), co AS (
      SELECT a.item AS item_a, b.item AS item_b, count(*)::BIGINT AS n_co
      FROM baskets a JOIN baskets b
        ON a.user_id = b.user_id AND a.item < b.item
      GROUP BY 1, 2 HAVING count(*) >= {_CF_MIN_CO}
    ), sym AS (
      SELECT item_a AS item, item_b AS other, n_co FROM co
      UNION ALL
      SELECT item_b, item_a, n_co FROM co
    ), scored AS (
      SELECT s.item, s.other, s.n_co,
             round(s.n_co::DOUBLE / sqrt(na.n::DOUBLE * nb.n::DOUBLE), 6)
               AS cosine
      FROM sym s
      JOIN item_n na ON s.item = na.item
      JOIN item_n nb ON s.other = nb.item
    )
    SELECT item, other, n_co, cosine, rank FROM (
      SELECT *, row_number() OVER (PARTITION BY item
                                   ORDER BY cosine DESC, other ASC) AS rank
      FROM scored
    ) WHERE rank <= {_CF_TOPK}
    """,
)
def q_item_covisitation_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{_CF_TOPK} related items per item by co-visitation cosine
    (n_co / √(n_a·n_b)) over distinct per-user view baskets, minimum
    {_CF_MIN_CO} co-occurrences — item-item CF, the related-items
    primitive.

    Scale shape: baskets dedupe to (user, item) pairs, the
    co-occurrence self-join is keyed on user_id (per-user basket
    widths bound the blowup — the same contract as association rules;
    cap basket size upstream for power users), counts and marginals
    are exact integers, and the per-item rank window orders that
    item's ≤|items| candidates. Cosine rounds to 6 dp before the
    (cosine, other) total order, so the top-k cut is
    engine-identical."""
    ev = read_table(spark, sf_dir, "events")
    baskets = (
        ev.where(F.col("event_type") == "view")
        .select(
            "user_id",
            F.get_json_object("props", "$.k").cast("int").alias("item"),
        )
        .distinct()
    )
    item_n = baskets.groupBy("item").agg(F.count(F.lit(1)).cast("long").alias("n"))
    a = baskets.select("user_id", F.col("item").alias("item_a"))
    b = baskets.select("user_id", F.col("item").alias("item_b"))
    co = (
        a.join(b, "user_id")
        .where(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_co"))
        .where(F.col("n_co") >= _CF_MIN_CO)
    )
    sym = co.select(
        F.col("item_a").alias("item"), F.col("item_b").alias("other"), "n_co"
    ).unionByName(
        co.select(
            F.col("item_b").alias("item"), F.col("item_a").alias("other"), "n_co"
        )
    )
    na = item_n.select(F.col("item"), F.col("n").alias("__na"))
    nb = item_n.select(F.col("item").alias("other"), F.col("n").alias("__nb"))
    scored = (
        sym.join(F.broadcast(na), "item")
        .join(F.broadcast(nb), "other")
        .select(
            "item",
            "other",
            "n_co",
            F.round(
                F.col("n_co").cast("double")
                / F.sqrt(F.col("__na").cast("double") * F.col("__nb")),
                6,
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("item").orderBy(F.col("cosine").desc(), F.col("other").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= _CF_TOPK)
    )
