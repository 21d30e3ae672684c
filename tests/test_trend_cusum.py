"""Semantics tests for registry_events (trend / CUSUM / Markov transitions):
recompute each statistic driver-side from the raw hourly counts and
check the distributed query agrees — independence from the SQL oracle,
which shares the queries' own formulation.
"""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from datas_spark.io.sources import read_table
from datas_spark.registry_events import (
    q_event_type_transitions,
    q_events_type_changepoint,
    q_events_type_trend,
)


def _hourly(spark, sf_dir):
    ev = read_table(spark, sf_dir, "events")
    rows = (
        ev.groupBy("event_type", F.date_trunc("hour", "ts").alias("h"))
        .agg(F.count("*").alias("y"))
        .collect()
    )
    by_type = defaultdict(list)
    for r in rows:
        by_type[r.event_type].append((r.h, r.y))
    for v in by_type.values():
        v.sort()
    return by_type


def test_trend_matches_naive_least_squares(spark, sf_dir):
    by_type = _hourly(spark, sf_dir)
    got = {r.event_type: r for r in q_events_type_trend(spark, sf_dir).collect()}
    assert set(got) == set(by_type)
    epoch = None
    for et, pts in by_type.items():
        if epoch is None:
            from datetime import datetime

            epoch = datetime(2024, 1, 1)
        xs = [int((h - epoch).total_seconds() // 3600) for h, _ in pts]
        ys = [y for _, y in pts]
        n = len(xs)
        sx, sy = sum(xs), sum(ys)
        sxx = sum(x * x for x in xs)
        sxy = sum(x * y for x, y in zip(xs, ys))
        slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        assert got[et].n == n
        assert abs(got[et].slope_per_hour - slope) < 1e-6


def test_changepoint_is_the_cusum_argmax(spark, sf_dir):
    by_type = _hourly(spark, sf_dir)
    got = {
        r.event_type: r for r in q_events_type_changepoint(spark, sf_dir).collect()
    }
    for et, pts in by_type.items():
        ys = [y for _, y in pts]
        n, tot = len(ys), sum(ys)
        cum, best = 0, None
        for i, (h, y) in enumerate(pts, start=1):
            cum += y
            d = abs(n * cum - i * tot)
            if best is None or d > best[0]:
                best = (d, h)
        assert got[et].deviation == best[0]
        assert got[et].changepoint_hour == best[1]
        assert got[et].n_hours == n


def test_transitions_are_a_probability_matrix(spark, sf_dir):
    out = q_event_type_transitions(spark, sf_dir).collect()
    by_src = defaultdict(float)
    total_cnt = 0
    for r in out:
        assert r.cnt > 0 and 0.0 < r.prob <= 1.0
        by_src[r.src] += r.prob
        total_cnt += r.cnt
    for src, s in by_src.items():
        assert abs(s - 1.0) < 1e-4, src
    # every adjacency is one (event, next-event) pair: total transition
    # count = #events − #users (each user's last event has no successor)
    ev = read_table(spark, sf_dir, "events")
    n_events = ev.count()
    n_users = ev.select("user_id").distinct().count()
    assert total_cnt == n_events - n_users
