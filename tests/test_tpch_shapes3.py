"""Semantics tests for registry_tpch — the last five TPC-H shapes
(Q6, Q7, Q9-adapted, Q11-adapted, Q20-adapted)."""

from __future__ import annotations

from pyspark.sql import functions as F

from datas_spark.io.sources import read_table
from datas_spark.registry_tpch import (
    q_dominant_supplier_parts,
    q_forecast_revenue_delta,
    q_important_part_value,
    q_nation_trade_volume,
    q_product_type_profit,
)


def test_q6_equals_naive_filtered_sum(spark, sf_dir):
    """The DECIMAL band aggregate must equal a driver-side recompute
    over the same filter."""
    out = q_forecast_revenue_delta(spark, sf_dir).collect()[0]
    rows = (
        read_table(spark, sf_dir, "lineitem")
        .where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_quantity") < 24)
        )
        .select("l_extendedprice", "l_discount")
        .collect()
    )
    expect_e4 = 0
    n = 0
    for r in rows:
        pct = round(r.l_discount * 100)
        if 5 <= pct <= 7:
            expect_e4 += round(r.l_extendedprice * 100) * pct
            n += 1
    assert out.n_lines == n
    assert abs(float(out.revenue_delta) - expect_e4 / 1e4) < 0.011


def test_q7_directions_are_disjoint_and_cover_both(spark, sf_dir):
    """Every output row is one of the two nation pairs and years stay
    in the filtered range."""
    rows = q_nation_trade_volume(spark, sf_dir).collect()
    assert rows, "expected at least one trade-volume row at sf0.001"
    for r in rows:
        assert {r.supp_nation, r.cust_nation} == {"NATION_3", "NATION_7"}
        assert r.supp_nation != r.cust_nation
        assert r.l_year in (1996, 1997)
        assert float(r.revenue) > 0


def test_q9_profit_below_revenue(spark, sf_dir):
    """Profit = revenue − cost must be strictly less than the same
    group's revenue-only aggregate (unit cost is positive)."""
    profit = {
        (r.nation, r.o_year): float(r.profit)
        for r in q_product_type_profit(spark, sf_dir).collect()
    }
    assert profit
    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part")
    supp = read_table(spark, sf_dir, "supplier")
    orders = read_table(spark, sf_dir, "orders")
    nation = read_table(spark, sf_dir, "nation")
    rev = (
        li.join(
            part.where(F.col("p_name").like("%gear%")).select("p_partkey"),
            F.col("l_partkey") == F.col("p_partkey"),
            "left_semi",
        )
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(
            F.sum(
                F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
            ).alias("rev")
        )
        .collect()
    )
    rev_map = {(r.nation, r.o_year): float(r.rev) for r in rev}
    assert set(profit) == set(rev_map)
    for k, p in profit.items():
        assert p < rev_map[k]


def test_q11_members_exceed_exact_share_threshold(spark, sf_dir):
    """Each returned part's e4 value must exceed 0.1% of the scoped
    total, and no excluded part may."""
    out = {int(r.partkey): int(r.value_e4) for r in q_important_part_value(spark, sf_dir).collect()}
    li = read_table(spark, sf_dir, "lineitem")
    supp = read_table(spark, sf_dir, "supplier")
    nation = read_table(spark, sf_dir, "nation")
    sn = supp.join(
        nation.where(F.col("n_name") == "NATION_3"),
        F.col("s_nationkey") == F.col("n_nationkey"),
        "left_semi",
    ).select("s_suppkey")
    scoped = (
        li.join(sn, F.col("l_suppkey") == F.col("s_suppkey"), "left_semi")
        .select(
            "l_partkey",
            (
                F.round(F.col("l_extendedprice") * 100).cast("long")
                * (F.lit(100) - F.round(F.col("l_discount") * 100).cast("long"))
            ).alias("rev_e4"),
        )
        .groupBy("l_partkey")
        .agg(F.sum("rev_e4").alias("value_e4"))
        .collect()
    )
    tot = sum(int(r.value_e4) for r in scoped)
    expect = {
        int(r.l_partkey): int(r.value_e4)
        for r in scoped
        if int(r.value_e4) * 1000 > tot
    }
    assert out == expect


def test_q20_dominant_suppliers_really_dominate(spark, sf_dir):
    """Every returned supplier must ship >50% of some qualifying
    part's total quantity in the window."""
    out = [int(r.suppkey) for r in q_dominant_supplier_parts(spark, sf_dir).collect()]
    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part")
    supp = read_table(spark, sf_dir, "supplier")
    nation = read_table(spark, sf_dir, "nation")
    shipped = (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .join(
            part.where(F.col("p_name").like("small%")).select("p_partkey"),
            F.col("l_partkey") == F.col("p_partkey"),
            "left_semi",
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .collect()
    )
    totals: dict = {}
    for r in shipped:
        totals[r.l_partkey] = totals.get(r.l_partkey, 0.0) + r.qty
    dominant = {r.l_suppkey for r in shipped if r.qty > totals[r.l_partkey] * 0.5}
    nation2 = {
        r.s_suppkey
        for r in supp.join(
            nation.where(F.col("n_name") == "NATION_8"),
            F.col("s_nationkey") == F.col("n_nationkey"),
            "left_semi",
        ).collect()
    }
    assert sorted(out) == sorted(dominant & nation2)
