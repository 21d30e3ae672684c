"""Registry batch 25 — TPC-H shape completion (Q4 semi-join priority
counts, Q14 conditional-share single pass, Q19 disjunctive-bracket
pushdown) and period-over-period growth with lag windows.

Money stays DECIMAL; the Q14/growth ratios divide two exact sums in
one float expression rounded to 6 dp — no accumulation-order hazard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from datas_spark.io.sources import read_table
from datas_spark.registry_core import register

_Q4_START = "1996-01-01"
_Q4_END = "1996-07-01"
_LATE_DAYS = 60


@register(
    "late_order_priority_counts",
    oracle=f"""
    SELECT o.o_orderpriority, count(*)::BIGINT AS order_count
    FROM orders o
    WHERE o.o_orderdate >= DATE '{_Q4_START}'
      AND o.o_orderdate < DATE '{_Q4_END}'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL {_LATE_DAYS} DAY)
    GROUP BY o.o_orderpriority
    ORDER BY o.o_orderpriority
    """,
)
def q_late_order_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: orders in a half-year window with at least one
    late-shipping lineitem (ship > order date + 60d — the testdata has
    no commitdate), counted by priority. The EXISTS decorrelates to a
    LEFT SEMI join — each qualifying order counts ONCE no matter how
    many lineitems were late, the bug a plain inner join would have.

    Scale notes: the date filter prunes orders before the join; the
    semi join carries only (orderkey, orderdate) against lineitem's
    (orderkey, shipdate) projection; the final aggregate has 5 groups."""
    orders = read_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit(_Q4_START).cast("date"))
        & (F.col("o_orderdate") < F.lit(_Q4_END).cast("date"))
    )
    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    qualified = orders.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), _LATE_DAYS)),
        "left_semi",
    )
    return (
        qualified.groupBy("o_orderpriority")
        .agg(F.count("*").cast("long").alias("order_count"))
        .orderBy("o_orderpriority")
    )


_Q14_START = "1996-03-01"
_Q14_END = "1996-04-01"


@register(
    "promo_revenue_share",
    oracle=f"""
    SELECT round(
      100.0 * sum(CASE WHEN p.p_type = 'PROMO'
                  THEN (l.l_extendedprice * (1 - l.l_discount))::DECIMAL(18,6)
                  ELSE 0::DECIMAL(18,6) END)::DOUBLE
      / sum((l.l_extendedprice * (1 - l.l_discount))::DECIMAL(18,6))::DOUBLE,
      6) AS promo_share_pct
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_shipdate >= DATE '{_Q14_START}'
      AND l.l_shipdate < DATE '{_Q14_END}'
    """,
)
def q_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: the promo type's share of one month's revenue —
    numerator and denominator from ONE conditional-aggregate pass (no
    second scan, no self-join), both DECIMAL-exact, divided once.

    Scale notes: the month filter prunes lineitem at the scan; part is
    the broadcast side; the aggregate is a single row."""
    li = read_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit(_Q14_START).cast("date"))
        & (F.col("l_shipdate") < F.lit(_Q14_END).cast("date"))
    )
    part = read_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,6)"
    )
    zero = F.lit(0).cast("decimal(18,6)")
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(zero))
                .cast("double")
                / F.sum(rev).cast("double"),
                6,
            ).alias("promo_share_pct")
        )
    )


@register(
    "disjunctive_bracket_revenue",
    oracle="""
    SELECT sum((l.l_extendedprice * (1 - l.l_discount))::DECIMAL(18,6))
             AS revenue,
           count(*)::BIGINT AS n_items
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#13' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 1 AND 20)
       OR (p.p_brand = 'Brand#19' AND p.p_size BETWEEN 11 AND 20
           AND l.l_quantity BETWEEN 10 AND 30)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 21 AND 30
           AND l.l_quantity BETWEEN 20 AND 40)
    """,
)
def q_disjunctive_bracket_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue over an OR of three (brand, size,
    quantity) brackets — the disjunctive-predicate test. Catalyst
    splits the OR: the part-only conjuncts (brand ∈ {...}) push to the
    part scan as a derived filter, the quantity bounds push to
    lineitem (qty ≥ 1 covers all brackets), and the residual OR
    evaluates after the join — the join itself stays a plain equi-join
    on partkey, never a nested loop over the disjunction."""
    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_size"
    )
    j = li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    br = (
        (
            (F.col("p_brand") == "Brand#13")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(1, 20)
        )
        | (
            (F.col("p_brand") == "Brand#19")
            & F.col("p_size").between(11, 20)
            & F.col("l_quantity").between(10, 30)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(21, 30)
            & F.col("l_quantity").between(20, 40)
        )
    )
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,6)"
    )
    return j.where(br).agg(
        F.sum(rev).alias("revenue"), F.count("*").cast("long").alias("n_items")
    )


@register(
    "weekly_revenue_growth",
    oracle="""
    WITH weekly AS (
      SELECT date_trunc('week', o_orderdate)::DATE AS week,
             sum(o_totalprice::DECIMAL(18,2)) AS revenue
      FROM orders GROUP BY 1
    )
    SELECT week, revenue,
           round((revenue::DOUBLE
                  - lag(revenue) OVER (ORDER BY week)::DOUBLE)
                 / lag(revenue) OVER (ORDER BY week)::DOUBLE * 100.0,
                 6) AS growth_pct
    FROM weekly ORDER BY week
    """,
)
def q_weekly_revenue_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Period-over-period growth: weekly order revenue with the
    percent change against the previous week via a lag window — the
    WoW/MoM reporting staple. The first week's growth is NULL (no
    prior period), preserved as such.

    Scale shape: revenue aggregates to ≤|weeks| rows BEFORE the
    partition-less lag window touches anything (the allowed
    window-above-aggregate case); sums are DECIMAL so the growth ratio
    divides two exact numbers."""
    orders = read_table(spark, sf_dir, "orders")
    weekly = orders.groupBy(
        F.date_trunc("week", "o_orderdate").cast("date").alias("week")
    ).agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("revenue"))
    w = Window.orderBy("week")
    prev = F.lag("revenue").over(w).cast("double")
    return weekly.select(
        "week",
        "revenue",
        F.round(
            (F.col("revenue").cast("double") - prev) / prev * 100.0, 6
        ).alias("growth_pct"),
    ).orderBy("week")
