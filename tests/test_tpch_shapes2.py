"""Semantics tests for registry_tpch (Q4 / Q14 / Q19 shapes, WoW growth)."""

from __future__ import annotations

from pyspark.sql import functions as F

from datas_spark.io.sources import read_table
from datas_spark.registry_tpch import (
    _Q4_LATE_DAYS,
    _Q4_END,
    _Q4_START,
    q_disjunctive_bracket_revenue,
    q_late_order_priority_counts,
    q_promo_revenue_share,
    q_weekly_revenue_growth,
)


def test_q4_counts_each_order_once(spark, sf_dir):
    """The semi join must count a multi-late-lineitem order once — the
    total must equal the DISTINCT count of qualifying orders."""
    out = q_late_order_priority_counts(spark, sf_dir).collect()
    total = sum(r.order_count for r in out)
    orders = read_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit(_Q4_START).cast("date"))
        & (F.col("o_orderdate") < F.lit(_Q4_END).cast("date"))
    )
    li = read_table(spark, sf_dir, "lineitem")
    distinct_late = (
        orders.join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .where(F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), _Q4_LATE_DAYS))
        .select("o_orderkey")
        .distinct()
        .count()
    )
    assert total == distinct_late
    assert total > 0


def test_q14_share_is_a_percentage_of_the_same_pass(spark, sf_dir):
    row = q_promo_revenue_share(spark, sf_dir).collect()[0]
    assert 0.0 <= row.promo_share_pct <= 100.0


def test_q19_brackets_union_individual_bracket_counts(spark, sf_dir):
    """n_items must equal the sum of the three disjoint brackets
    (brands differ, so no row satisfies two brackets)."""
    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part")
    j = li.join(part, F.col("l_partkey") == F.col("p_partkey"))
    brackets = [
        ("Brand#13", (1, 10), (1, 20)),
        ("Brand#19", (11, 20), (10, 30)),
        ("Brand#23", (21, 30), (20, 40)),
    ]
    parts_sum = 0
    for brand, (s1, s2), (q1, q2) in brackets:
        parts_sum += j.where(
            (F.col("p_brand") == brand)
            & F.col("p_size").between(s1, s2)
            & F.col("l_quantity").between(q1, q2)
        ).count()
    out = q_disjunctive_bracket_revenue(spark, sf_dir).collect()[0]
    assert out.n_items == parts_sum


def test_weekly_growth_matches_adjacent_revenue_ratio(spark, sf_dir):
    rows = q_weekly_revenue_growth(spark, sf_dir).collect()
    assert rows[0].growth_pct is None  # no prior period
    for prev, cur in zip(rows, rows[1:]):
        expect = (float(cur.revenue) - float(prev.revenue)) / float(prev.revenue) * 100
        assert abs(cur.growth_pct - expect) < 1e-4
