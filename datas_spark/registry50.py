"""Registry batch 50 — behavioral and operational distributions:
per-user event-type entropy (habit vs exploration) and shipping-lag
percentiles by order priority.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datas_spark.io.sources import read_table
from datas_spark.registry_core import register


@register(
    "user_type_entropy",
    oracle="""
    WITH c AS (
      SELECT user_id, event_type, count(*)::BIGINT AS n
      FROM events GROUP BY 1, 2
    ), t AS (
      SELECT user_id, sum(n)::BIGINT AS tot, count(*)::BIGINT AS n_types
      FROM c GROUP BY 1
    )
    SELECT c.user_id, max(t.tot)::BIGINT AS n_events,
           max(t.n_types)::BIGINT AS n_types,
           round(sum(-(c.n::DOUBLE / t.tot) * ln(c.n::DOUBLE / t.tot)), 6)
             AS type_entropy_nats
    FROM c JOIN t USING (user_id)
    GROUP BY c.user_id
    """,
)
def q_user_type_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user behavioral entropy over event types: 0 = the user does
    one thing; ln(|types|) = uniform exploration — the habit feature
    behavioral segmentation models start from. Two chained combinable
    aggregates on the user key (one shuffle — the totals frame is a
    re-agg of the counts); entropy sums ≤ |types| float terms per
    user from exact integer counts."""
    ev = read_table(spark, sf_dir, "events")
    c = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    t = c.groupBy("user_id").agg(
        F.sum("n").cast("long").alias("tot"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
    )
    p = F.col("n").cast("double") / F.col("tot")
    return (
        c.join(t, "user_id")
        .groupBy("user_id")
        .agg(
            F.max("tot").cast("long").alias("n_events"),
            F.max("n_types").cast("long").alias("n_types"),
            F.round(F.sum(-p * F.log(p)), 6).alias("type_entropy_nats"),
        )
    )


@register(
    "shipping_lag_by_priority",
    oracle="""
    WITH lags AS (
      SELECT o.o_orderpriority,
             date_diff('day', o.o_orderdate, l.l_shipdate)::BIGINT AS lag_days
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    )
    SELECT o_orderpriority, count(*)::BIGINT AS n_lines,
           round(avg(lag_days::DOUBLE), 6) AS mean_days,
           round(quantile_cont(lag_days::DOUBLE, 0.5), 6) AS p50_days,
           round(quantile_cont(lag_days::DOUBLE, 0.9), 6) AS p90_days
    FROM lags GROUP BY o_orderpriority
    """,
)
def q_shipping_lag_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fulfillment SLA distribution: order-to-ship lag in whole days
    per order priority (count, mean, p50, p90) — does the 1-URGENT
    queue actually ship faster? The join is the one orderkey shuffle;
    lags are exact integer days; mean and percentiles are combinable
    buffers per priority (5 groups)."""
    orders = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    lags = orders.join(
        li.select("l_orderkey", "l_shipdate"),
        F.col("o_orderkey") == F.col("l_orderkey"),
    ).select(
        "o_orderpriority",
        F.datediff(
            F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date")
        )
        .cast("long")
        .alias("lag_days"),
    )
    d = F.col("lag_days").cast("double")
    return lags.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        F.round(F.avg(d), 6).alias("mean_days"),
        F.round(F.percentile(d, F.lit(0.5)), 6).alias("p50_days"),
        F.round(F.percentile(d, F.lit(0.9)), 6).alias("p90_days"),
    )
