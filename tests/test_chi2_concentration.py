"""Semantics tests for registry_eval: chi-square independence and revenue
concentration — recomputed driver-side from raw counts."""

from __future__ import annotations

from collections import Counter

import pytest

from pyspark.sql import functions as F

from datas_spark.io.sources import read_table
from datas_spark.registry_eval import (
    _CONC_Q,
    q_events_type_hour_chi2,
    q_revenue_concentration,
)


def test_chi2_matches_naive_contingency_computation(spark, sf_dir):
    ev = read_table(spark, sf_dir, "events")
    rows = ev.select(
        "event_type", (F.hour("ts") / 6).cast("int").alias("hb")
    ).collect()
    cells = Counter((r.event_type, r.hb) for r in rows)
    row_tot = Counter()
    col_tot = Counter()
    for (t, h), c in cells.items():
        row_tot[t] += c
        col_tot[h] += c
    n = sum(cells.values())
    chi2 = 0.0
    for (t, h), obs in cells.items():
        exp = row_tot[t] * col_tot[h] / n
        chi2 += (obs - exp) ** 2 / exp
    out = q_events_type_hour_chi2(spark, sf_dir).collect()[0]
    assert out.chi2 == pytest.approx(chi2, abs=1e-4)
    assert out.dof == (len(row_tot) - 1) * (len(col_tot) - 1)


def test_concentration_share_matches_sorted_recompute(spark, sf_dir):
    orders = read_table(spark, sf_dir, "orders")
    per = (
        orders.groupBy("o_custkey")
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev"))
        .collect()
    )
    revs = sorted(float(r.rev) for r in per)
    out = q_revenue_concentration(spark, sf_dir).collect()[0]
    assert out.all_customers == len(revs)
    top = [v for v in revs if v >= out.threshold]
    assert out.top_customers == len(top)
    assert out.top_share_pct == pytest.approx(
        sum(top) / sum(revs) * 100.0, abs=1e-4
    )
    # the threshold really is ~the (1-q) tail: at most ceil((1-q)*n)+1
    # customers clear an interpolated p99 cut
    assert out.top_customers <= int((1 - _CONC_Q) * len(revs)) + 2
