"""Registry batch 24 — growth accounting and the TPC-H Q15 shape:
daily new/cumulative user curve, and top-supplier-by-period-revenue
against a scalar max (the view + max-subquery decorrelation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from datas_spark.io.sources import read_table
from datas_spark.registry_core import register


@register(
    "user_growth_curve",
    oracle="""
    WITH first_seen AS (
      SELECT user_id, min(date_trunc('day', ts))::DATE AS d0
      FROM events GROUP BY user_id
    ), daily_new AS (
      SELECT d0 AS day, count(*)::BIGINT AS new_users
      FROM first_seen GROUP BY d0
    ), dau AS (
      SELECT date_trunc('day', ts)::DATE AS day,
             count(DISTINCT user_id)::BIGINT AS active_users
      FROM events GROUP BY 1
    )
    SELECT d.day, coalesce(n.new_users, 0)::BIGINT AS new_users,
           d.active_users,
           sum(coalesce(n.new_users, 0)) OVER (ORDER BY d.day
                                  ROWS UNBOUNDED PRECEDING)::BIGINT
             AS cumulative_users
    FROM dau d LEFT JOIN daily_new n USING (day)
    ORDER BY day
    """,
)
def q_user_growth_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Growth accounting over the event stream: per day, first-time
    users (by each user's min event day), distinct active users, and
    the running total of users ever seen — the new/active/cumulative
    triple behind every growth dashboard.

    Scale shape: first-seen is a combinable min per user; both daily
    frames aggregate before joining, so the join and the running-sum
    window operate on ≤|days| rows (the partition-less window sits
    ABOVE an aggregate — metadata-sized, the allowed case). Every
    user's full history never collects anywhere."""
    ev = read_table(spark, sf_dir, "events")
    day = F.date_trunc("day", "ts").cast("date")
    first_seen = ev.groupBy("user_id").agg(F.min(day).alias("d0"))
    daily_new = first_seen.groupBy(F.col("d0").alias("day")).agg(
        F.count("*").cast("long").alias("new_users")
    )
    dau = ev.groupBy(day.alias("day")).agg(
        F.count_distinct("user_id").cast("long").alias("active_users")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return (
        dau.join(daily_new, "day", "left")
        .withColumn("new_users", F.coalesce("new_users", F.lit(0)).cast("long"))
        .select(
            "day",
            "new_users",
            "active_users",
            F.sum("new_users").over(w).cast("long").alias("cumulative_users"),
        )
        .orderBy("day")
    )


_Q15_START = "1996-01-01"
_Q15_END = "1996-04-01"


@register(
    "top_revenue_supplier",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             sum((l_extendedprice * (1 - l_discount))::DECIMAL(18,6))
               AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= DATE '{_Q15_START}'
        AND l_shipdate < DATE '{_Q15_END}'
      GROUP BY l_suppkey
    ), best AS (
      SELECT max(total_revenue) AS mx FROM revenue
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM revenue r
    JOIN supplier s ON s.s_suppkey = r.supplier_no
    CROSS JOIN best b
    WHERE r.total_revenue = b.mx
    ORDER BY s.s_suppkey
    """,
)
def q_top_revenue_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the supplier(s) with the maximum revenue over a
    shipping quarter — the classic view + scalar-max-subquery,
    decorrelated into an aggregate joined against its own 1-row max
    (ALL ties returned, per Q15's spec).

    Revenue sums in DECIMAL so the max-equality comparison is exact —
    a float sum would make "equals the max" engine-dependent. The
    1-row max broadcasts; the supplier dim join broadcasts; the only
    shuffle is the revenue aggregate on l_suppkey."""
    li = read_table(spark, sf_dir, "lineitem")
    supp = read_table(spark, sf_dir, "supplier")
    revenue = (
        li.where(
            (F.col("l_shipdate") >= F.lit(_Q15_START).cast("date"))
            & (F.col("l_shipdate") < F.lit(_Q15_END).cast("date"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(18,6)"
                )
            ).alias("total_revenue")
        )
    )
    best = revenue.agg(F.max("total_revenue").alias("mx"))
    return (
        revenue.crossJoin(F.broadcast(best))
        .where(F.col("total_revenue") == F.col("mx"))
        .join(F.broadcast(supp), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )
