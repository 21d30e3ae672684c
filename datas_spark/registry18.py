"""Registry batch 18 — TPC-H Q21 shape (semi + anti join choreography)
and Q2 shape (per-group argmin join)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datas_spark.io.sources import read_table
from datas_spark.registry import register

# "late" = shipped more than 90 days after the order date (the testdata
# lineitem has no commitdate; the shape — not the predicate — is Q21's)
_LATE_DAYS = 90


@register(
    "late_supplier_blame",
    oracle=f"""
    WITH li AS (
      SELECT l.l_orderkey, l.l_suppkey,
             (l.l_shipdate > o.o_orderdate + INTERVAL {_LATE_DAYS} DAY) AS late
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    ), blamed AS (
      SELECT DISTINCT a.l_orderkey, a.l_suppkey
      FROM li a
      WHERE a.late
        AND EXISTS (SELECT 1 FROM li b
                    WHERE b.l_orderkey = a.l_orderkey
                      AND b.l_suppkey != a.l_suppkey)
        AND NOT EXISTS (SELECT 1 FROM li c
                        WHERE c.l_orderkey = a.l_orderkey
                          AND c.l_suppkey != a.l_suppkey AND c.late)
    )
    SELECT s.s_name, count(*)::BIGINT AS numwait
    FROM blamed b JOIN supplier s ON s.s_suppkey = b.l_suppkey
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name ASC LIMIT 25
    """,
)
def q_late_supplier_blame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the SOLE late shipper on
    multi-supplier orders — one semi join (another supplier exists) and
    one anti join (no OTHER supplier was late) against the same
    per-order frame, then a keyed count.

    Scale notes: the li frame reduces to (orderkey, suppkey, late)
    before any of the three self-references; all three shuffles share
    the l_orderkey key so AQE reuses the exchange; the supplier dim
    joins broadcast."""
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    supp = read_table(spark, sf_dir, "supplier")
    base = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            "l_orderkey",
            "l_suppkey",
            (F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), _LATE_DAYS)).alias(
                "late"
            ),
        )
    )
    a = base.where("late").select("l_orderkey", "l_suppkey").distinct()
    others = base.select(
        F.col("l_orderkey").alias("o_k"), F.col("l_suppkey").alias("o_s"), "late"
    )
    has_other = a.join(
        others,
        (F.col("l_orderkey") == F.col("o_k")) & (F.col("l_suppkey") != F.col("o_s")),
        "left_semi",
    )
    no_other_late = has_other.join(
        others.where("late"),
        (F.col("l_orderkey") == F.col("o_k")) & (F.col("l_suppkey") != F.col("o_s")),
        "left_anti",
    )
    return (
        no_other_late.join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).cast("long").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(25)
    )


@register(
    "min_cost_supplier",
    oracle="""
    WITH costs AS (
      SELECT p.p_partkey, l.l_suppkey,
             min(CAST(l.l_extendedprice AS DECIMAL(14,2))) AS min_price
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      GROUP BY p.p_partkey, l.l_suppkey
    ), best AS (
      SELECT p_partkey, l_suppkey, min_price,
             row_number() OVER (PARTITION BY p_partkey
                                ORDER BY min_price ASC, l_suppkey ASC) AS rn
      FROM costs
    )
    SELECT b.p_partkey, s.s_name,
           CAST(b.min_price AS DECIMAL(14,2)) AS min_price
    FROM best b JOIN supplier s ON s.s_suppkey = b.l_suppkey
    WHERE rn = 1
    ORDER BY b.p_partkey LIMIT 100
    """,
)
def q_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: the cheapest supplier per part — the correlated
    "price = (SELECT min ...)" subquery expressed as a per-part argmin
    (rank-1 window over the pre-aggregated (part, supplier) price
    table, deterministic supplier tie-break). The window partitions on
    p_partkey: per-key local sort, never a global one."""
    from pyspark.sql import Window

    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part")
    supp = read_table(spark, sf_dir, "supplier")
    costs = (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_partkey", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice").cast("decimal(14,2)")).alias("min_price"))
    )
    w = Window.partitionBy("p_partkey").orderBy(
        F.asc("min_price"), F.asc("l_suppkey")
    )
    return (
        costs.withColumn("rn", F.row_number().over(w))
        .where("rn = 1")
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "p_partkey",
            "s_name",
            F.col("min_price").cast("decimal(14,2)").alias("min_price"),
        )
        .orderBy("p_partkey")
        .limit(100)
    )
