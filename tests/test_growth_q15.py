"""Semantics tests for registry_tpch (growth curve / Q15 shape)."""

from __future__ import annotations

from pyspark.sql import functions as F

from datas_spark.io.sources import read_table
from datas_spark.registry_tpch import q_top_revenue_supplier, q_user_growth_curve


def test_growth_curve_covers_every_active_day_and_sums_to_user_count(
    spark, sf_dir
):
    rows = q_user_growth_curve(spark, sf_dir).collect()
    ev = read_table(spark, sf_dir, "events")
    n_days = ev.select(F.date_trunc("day", "ts").cast("date")).distinct().count()
    n_users = ev.select("user_id").distinct().count()
    assert len(rows) == n_days  # zero-new-user days stay on the curve
    assert sum(r.new_users for r in rows) == n_users
    assert rows[-1].cumulative_users == n_users
    # cumulative is nondecreasing and consistent with new_users
    cum = 0
    for r in rows:
        cum += r.new_users
        assert r.cumulative_users == cum
        assert 0 < r.active_users <= n_users


def test_top_revenue_supplier_is_the_argmax_with_ties(spark, sf_dir):
    from datas_spark.registry_tpch import _Q15_END, _Q15_START

    li = read_table(spark, sf_dir, "lineitem")
    rev = (
        li.where(
            (F.col("l_shipdate") >= F.lit(_Q15_START).cast("date"))
            & (F.col("l_shipdate") < F.lit(_Q15_END).cast("date"))
        )
        .groupBy("l_suppkey")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(18,6)"
                )
            ).alias("r")
        )
        .collect()
    )
    mx = max(row.r for row in rev)
    winners = sorted(row.l_suppkey for row in rev if row.r == mx)
    out = q_top_revenue_supplier(spark, sf_dir).collect()
    assert sorted(r.s_suppkey for r in out) == winners
    assert all(r.total_revenue == mx for r in out)
