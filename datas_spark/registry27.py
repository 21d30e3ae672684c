"""Registry batch 27 — histogram-sketch quantiles (the mergeable
quantile state completing the sketch suite) and weekly rank-delta
trending over event types.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from datas_spark.io.sources import read_table
from datas_spark.operators import sketches as SK
from datas_spark.registry_core import register

_H_LO, _H_HI, _H_BINS = 0.0, 512.0, 256
_H_W = (_H_HI - _H_LO) / _H_BINS  # 2.0 — exact in binary
_H_QS = [0.5, 0.9, 0.99]
_QS_SQL = ", ".join(f"({q})" for q in _H_QS)


@register(
    "events_value_hist_quantiles",
    oracle=f"""
    WITH regs AS (
      SELECT least(greatest(floor((value::DOUBLE - {_H_LO}) / {_H_W}), 0),
                   {_H_BINS - 1})::INT AS bin,
             count(*)::BIGINT AS cnt
      FROM events WHERE value IS NOT NULL GROUP BY 1
    ), walk AS (
      SELECT bin, cnt,
             sum(cnt) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING)::BIGINT AS cum,
             sum(cnt) OVER ()::BIGINT AS total
      FROM regs
    ), qs AS (SELECT q::DOUBLE AS q FROM (VALUES {_QS_SQL}) v(q)),
    hit AS (
      SELECT qs.q, min(w.bin) AS bin
      FROM walk w JOIN qs ON w.cum >= qs.q * w.total
      GROUP BY qs.q
    )
    SELECT h.q,
           round(least({_H_LO} + {_H_W} * (w.bin::DOUBLE
                 + (h.q * w.total::DOUBLE - (w.cum::DOUBLE - w.cnt::DOUBLE))
                   / w.cnt::DOUBLE), {_H_HI}), 6) AS est
    FROM hit h JOIN walk w ON w.bin = h.bin
    ORDER BY h.q
    """,
)
def q_events_value_hist_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate p50/p90/p99 of event values from a 256-bin histogram
    sketch — the MERGEABLE quantile path (merge = sum counts per bin)
    for streams and multi-segment corpora where the exact percentile
    buffer can't combine. Error is bounded by one bin width (2.0 here).

    Scale shape: the register build is a fixed-256-address groupBy
    (map-side combined, shuffle moves ≤ 256 rows); the cumulative walk
    and interpolation run on the 256-row register table; quantile
    targets are a broadcast literal (see ``sketches.histogram_*``)."""
    ev = read_table(spark, sf_dir, "events")
    regs = SK.histogram_registers(ev, "value", _H_LO, _H_HI, _H_BINS)
    return SK.histogram_quantiles(regs, _H_QS, _H_LO, _H_HI, _H_BINS)


@register(
    "weekly_type_rank_delta",
    oracle="""
    WITH weekly AS (
      SELECT date_trunc('week', ts)::DATE AS week, event_type,
             count(*)::BIGINT AS cnt
      FROM events GROUP BY 1, 2
    ), ranked AS (
      SELECT week, event_type, cnt,
             row_number() OVER (PARTITION BY week
                                ORDER BY cnt DESC, event_type ASC)::BIGINT AS rk
      FROM weekly
    )
    SELECT week, event_type, cnt, rk,
           (lag(rk) OVER (PARTITION BY event_type ORDER BY week) - rk)::BIGINT
             AS rank_delta
    FROM ranked ORDER BY week, rk
    """,
)
def q_weekly_type_rank_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trending detection: each event type's popularity rank within
    every week, and how many positions it climbed (+) or fell (−)
    since the previous week — the rank-delta view behind "rising this
    week" panels. First-week deltas are NULL (no prior period).

    Scale shape: the weekly aggregate reduces to ≤ |weeks|·|types|
    rows before any window; the in-week rank partitions by week, the
    delta lag partitions by type — both metadata-sized."""
    ev = read_table(spark, sf_dir, "events")
    weekly = ev.groupBy(
        F.date_trunc("week", "ts").cast("date").alias("week"), "event_type"
    ).agg(F.count("*").cast("long").alias("cnt"))
    rk_w = Window.partitionBy("week").orderBy(F.desc("cnt"), F.asc("event_type"))
    ranked = weekly.withColumn("rk", F.row_number().over(rk_w).cast("long"))
    lag_w = Window.partitionBy("event_type").orderBy("week")
    return ranked.select(
        "week",
        "event_type",
        "cnt",
        "rk",
        (F.lag("rk").over(lag_w) - F.col("rk")).cast("long").alias("rank_delta"),
    ).orderBy("week", "rk")
