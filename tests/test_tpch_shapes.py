"""Semantics tests for the registry_tpch TPC-H shapes (Q13/Q17/Q22).

The oracle gate proves Spark == DuckDB on the same SQL; these tests
prove the SQL itself means what the docstrings claim — zero-order
customers survive the outer join, the integer threshold equals the
float definition, the anti join really excludes the priority class.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from datas_spark.io.sources import read_table
from datas_spark.registry_tpch import (
    q_customer_order_distribution,
    q_idle_customer_balance,
    q_small_quantity_revenue,
)


def test_q13_distribution_partitions_all_customers(spark, sf_dir):
    """Every customer lands in exactly one c_count bucket — the outer
    join must not drop customers whose orders were all filtered out."""
    dist = q_customer_order_distribution(spark, sf_dir)
    total = dist.agg(F.sum("custdist").cast("long").alias("n")).collect()[0].n
    n_cust = read_table(spark, sf_dir, "customer").count()
    assert total == n_cust


def test_q13_zero_bucket_matches_anti_join(spark, sf_dir):
    """The c_count=0 bucket equals the customers with no non-URGENT
    orders (the outer-join zero-preservation the shape exists for)."""
    dist = {r.c_count: r.custdist for r in
            q_customer_order_distribution(spark, sf_dir).collect()}
    cust = read_table(spark, sf_dir, "customer").select("c_custkey")
    orders = (
        read_table(spark, sf_dir, "orders")
        .where(F.col("o_orderpriority") != "1-URGENT")
        .select("o_custkey")
    )
    none = cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti").count()
    assert dist.get(0, 0) == none


def test_q17_integer_threshold_equals_float_definition(spark, sf_dir):
    """qty * 5 * cnt < sum_qty  <=>  qty < 0.2 * avg(qty): the
    multiplied-through BIGINT comparison must select exactly the rows
    the float definition selects (quantities are integral, so no
    rounding gap exists for the scaled form to miss)."""
    li = (
        read_table(spark, sf_dir, "lineitem")
        .join(
            read_table(spark, sf_dir, "part").where("p_brand = 'Brand#13'"),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .select("l_partkey", F.col("l_quantity").cast("long").alias("qty"))
    )
    stats = li.groupBy(F.col("l_partkey").alias("k")).agg(
        F.sum("qty").alias("s"), F.count("*").alias("c")
    )
    joined = li.join(stats, li.l_partkey == stats.k)
    int_rows = joined.where(F.col("qty") * 5 * F.col("c") < F.col("s")).count()
    float_rows = joined.where(
        F.col("qty") < 0.2 * (F.col("s") / F.col("c"))
    ).count()
    assert int_rows == float_rows
    # and the query itself runs and yields the one-row aggregate
    out = q_small_quantity_revenue(spark, sf_dir).collect()
    assert len(out) == 1


def test_q22_excludes_urgent_customers_and_threshold_is_strict(spark, sf_dir):
    """No selected nation group may contain a customer with an URGENT
    order, and every selected customer's balance strictly exceeds the
    positive-balance average of the pool."""
    pool = (
        read_table(spark, sf_dir, "customer")
        .where(F.col("c_nationkey").isin(1, 3, 5, 7, 9, 11, 13))
        .select(
            "c_custkey",
            F.round(F.col("c_acctbal") * 100).cast("long").alias("bal_cents"),
        )
    )
    tot, cnt = (
        pool.where("bal_cents > 0")
        .agg(F.sum("bal_cents"), F.count("*"))
        .collect()[0]
    )
    urgent = {
        r.o_custkey
        for r in read_table(spark, sf_dir, "orders")
        .where("o_orderpriority = '1-URGENT'")
        .select("o_custkey")
        .distinct()
        .collect()
    }
    selected = [
        r
        for r in pool.collect()
        if r.bal_cents * cnt > tot and r.c_custkey not in urgent
    ]
    out = q_idle_customer_balance(spark, sf_dir)
    got_numcust = out.agg(F.sum("numcust").cast("long").alias("n")).collect()[0].n
    assert got_numcust == len(selected)
