"""Registry batch 19 — the remaining classic TPC-H join/agg shapes:
Q13 (outer-join count distribution), Q17 (per-group average threshold
filter), Q22 (anti-join + global scalar threshold).

All three use exact arithmetic across row boundaries (BIGINT counts,
DECIMAL sums, and the multiply-through trick ``x > avg(y)  <=>
x * cnt > sum(y)``) so the DuckDB oracle hash-matches bit-for-bit —
no float summation-order hazards.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datas_spark.io.sources import read_table
from datas_spark.registry_core import register


@register(
    "customer_order_distribution",
    oracle="""
    WITH c_orders AS (
      SELECT c.c_custkey, count(o.o_orderkey)::BIGINT AS c_count
      FROM customer c
      LEFT JOIN orders o
        ON o.o_custkey = c.c_custkey
       AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    )
    SELECT c_count, count(*)::BIGINT AS custdist
    FROM c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: how many customers placed 0, 1, 2, ... orders
    (excluding one priority class — the stand-in for Q13's comment
    filter; the testdata orders table has no o_comment).

    Scale notes: the orders side is filtered and column-pruned to
    (o_custkey) before the join; the LEFT join preserves zero-order
    customers (the part a naive inner-join + groupBy gets wrong). The
    first aggregate shuffles on c_custkey — the join key — so AQE
    reuses the exchange; the second aggregate's key space is tiny
    (max orders per customer), a few dozen groups regardless of SF.
    """
    cust = read_table(spark, sf_dir, "customer").select("c_custkey")
    orders = (
        read_table(spark, sf_dir, "orders")
        .where(F.col("o_orderpriority") != "1-URGENT")
        .select("o_custkey", "o_orderkey")
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@register(
    "small_quantity_revenue",
    oracle="""
    WITH p AS (
      SELECT p_partkey FROM part WHERE p_brand = 'Brand#13'
    ), li AS (
      SELECT l.l_partkey, l.l_quantity::BIGINT AS qty,
             l.l_extendedprice::DECIMAL(18,2) AS price
      FROM lineitem l JOIN p ON p.p_partkey = l.l_partkey
    ), stats AS (
      SELECT l_partkey, sum(qty)::BIGINT AS sum_qty,
             count(*)::BIGINT AS cnt
      FROM li GROUP BY l_partkey
    )
    SELECT (sum(li.price) / 7)::DECIMAL(18,6) AS avg_yearly
    FROM li JOIN stats s ON s.l_partkey = li.l_partkey
    WHERE li.qty * 5 * s.cnt < s.sum_qty
    """,
)
def q_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue lost to small orders — lineitems of one
    brand whose quantity is below 20% of that part's average quantity.

    The threshold ``qty < 0.2 * avg(qty)`` is multiplied through to
    ``qty * 5 * cnt < sum(qty)`` so the comparison is exact BIGINT
    arithmetic — no float-average boundary flakiness between engines
    (l_quantity is integral in TPC-H).

    Scale notes: the brand filter broadcasts (one brand of ~25 → part
    side is small); the per-part stats aggregate and the stats join
    both key on l_partkey so the exchange is reused; no correlated
    subquery — the classic decorrelation into join-against-aggregate.
    """
    part = (
        read_table(spark, sf_dir, "part")
        .where(F.col("p_brand") == "Brand#13")
        .select("p_partkey")
    )
    li = (
        read_table(spark, sf_dir, "lineitem")
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .select(
            "l_partkey",
            F.col("l_quantity").cast("long").alias("qty"),
            F.col("l_extendedprice").cast("decimal(18,2)").alias("price"),
        )
    )
    stats = li.groupBy(F.col("l_partkey").alias("s_partkey")).agg(
        F.sum("qty").cast("long").alias("sum_qty"),
        F.count("*").alias("cnt"),
    )
    return (
        li.join(stats, li.l_partkey == stats.s_partkey)
        .where(F.col("qty") * 5 * F.col("cnt") < F.col("sum_qty"))
        .agg((F.sum("price") / 7).cast("decimal(18,6)").alias("avg_yearly"))
    )


@register(
    "idle_customer_balance",
    oracle="""
    WITH pool AS (
      SELECT c_custkey, c_nationkey,
             (c_acctbal * 100)::BIGINT AS bal_cents
      FROM customer
      WHERE c_nationkey IN (1, 3, 5, 7, 9, 11, 13)
    ), avg_pos AS (
      SELECT sum(bal_cents)::BIGINT AS tot, count(*)::BIGINT AS cnt
      FROM pool WHERE bal_cents > 0
    )
    SELECT p.c_nationkey::INT AS cntry,
           count(*)::BIGINT AS numcust,
           (sum(p.bal_cents)::DECIMAL(18,0) / 100)::DECIMAL(18,2)
             AS totacctbal
    FROM pool p, avg_pos a
    WHERE p.bal_cents * a.cnt > a.tot
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = p.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    GROUP BY p.c_nationkey
    ORDER BY cntry
    """,
)
def q_idle_customer_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: wealthy-but-idle customers — above-average
    balance (within a nation pool, vs the average of positive
    balances), no URGENT orders (the testdata gives every customer at
    least one order, so the idleness test keys on a priority class to
    stay non-trivial), grouped by nation.

    Balances are 2-decimal exact, so they move through the query as
    integer cents; ``bal > avg(pos_bal)`` becomes
    ``bal_cents * cnt > tot_cents`` — exact BIGINT on both engines.

    Scale notes: the scalar (tot, cnt) aggregate is one row,
    broadcast-crossed (no shuffle); the "no orders" test is a LEFT
    ANTI join on the customer key (never a count-subquery per row);
    the final aggregate has ≤25 groups.
    """
    pool = (
        read_table(spark, sf_dir, "customer")
        .where(F.col("c_nationkey").isin(1, 3, 5, 7, 9, 11, 13))
        .select(
            "c_custkey",
            "c_nationkey",
            F.round(F.col("c_acctbal") * 100).cast("long").alias("bal_cents"),
        )
    )
    avg_pos = pool.where(F.col("bal_cents") > 0).agg(
        F.sum("bal_cents").cast("long").alias("tot"),
        F.count("*").alias("cnt"),
    )
    orders = (
        read_table(spark, sf_dir, "orders")
        .where(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    return (
        pool.crossJoin(F.broadcast(avg_pos))
        .where(F.col("bal_cents") * F.col("cnt") > F.col("tot"))
        .join(orders, pool.c_custkey == orders.o_custkey, "left_anti")
        .groupBy(F.col("c_nationkey").cast("int").alias("cntry"))
        .agg(
            F.count("*").alias("numcust"),
            (F.sum("bal_cents").cast("decimal(18,0)") / 100)
            .cast("decimal(18,2)")
            .alias("totacctbal"),
        )
        .orderBy("cntry")
    )
