"""Semantics tests for registry_tpch (Q12 / Q16 shapes, activity streaks)."""

from __future__ import annotations

from collections import defaultdict
from datetime import timedelta

from pyspark.sql import functions as F

from datas_spark.io.sources import read_table
from datas_spark.registry_tpch import (
    q_shipping_delay_priority_counts,
    q_supplier_count_by_part_bracket,
    q_user_activity_streaks,
)


def test_q12_buckets_partition_all_joined_lineitems(spark, sf_dir):
    out = q_shipping_delay_priority_counts(spark, sf_dir).collect()
    total = sum(r.high_line_count + r.low_line_count for r in out)
    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey")
    orders = read_table(spark, sf_dir, "orders").select("o_orderkey")
    joined = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey")).count()
    assert total == joined


def test_q16_excludes_negative_balance_suppliers(spark, sf_dir):
    bad = {
        r.s_suppkey
        for r in read_table(spark, sf_dir, "supplier")
        .where("s_acctbal < 0")
        .collect()
    }
    # recompute one group's distinct suppliers driver-side
    li = read_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    part = read_table(spark, sf_dir, "part").where("p_type <> 'PROMO'")
    rows = (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .select("p_brand", "p_size", "l_suppkey")
        .collect()
    )
    expect = defaultdict(set)
    for r in rows:
        if r.l_suppkey not in bad:
            cls = "small" if r.p_size <= 25 else "large"
            expect[(r.p_brand, cls)].add(r.l_suppkey)
    got = {
        (r.p_brand, r.size_class): r.supplier_cnt
        for r in q_supplier_count_by_part_bracket(spark, sf_dir).collect()
    }
    assert got == {k: len(v) for k, v in expect.items()}


def test_streaks_are_maximal_consecutive_runs(spark, sf_dir):
    """Recompute each reported user's longest run driver-side from
    their distinct active days."""
    out = q_user_activity_streaks(spark, sf_dir).collect()
    assert 0 < len(out) <= 20
    ev = read_table(spark, sf_dir, "events")
    days = {
        (r.user_id, r.d)
        for r in ev.select(
            "user_id", F.date_trunc("day", "ts").cast("date").alias("d")
        )
        .distinct()
        .collect()
    }
    by_user = defaultdict(list)
    for u, d in days:
        by_user[u].append(d)
    for r in out:
        ds = sorted(by_user[r.user_id])
        best, cur, start, best_start = 1, 1, ds[0], ds[0]
        for a, b in zip(ds, ds[1:]):
            if b - a == timedelta(days=1):
                cur += 1
            else:
                cur, start = 1, b
            if cur > best:
                best, best_start = cur, start
        assert r.longest_streak_days == best
        assert r.streak_start == best_start
