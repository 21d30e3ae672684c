"""Registry batch 37 — the ROLLUP grouping-set shape (hierarchical
subtotals: leaf → per-type → grand total), completing the grouping-set
family next to `events_cube`'s full CUBE. Same one-Expand-pass plan,
DECIMAL-exact totals, grouping flags disambiguating subtotal NULLs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datas_spark.io.sources import read_table
from datas_spark.registry_core import register


@register(
    "events_type_hour_rollup",
    oracle="""
    SELECT grouping(event_type)::INT AS g_type,
           grouping(hour_bucket)::INT AS g_hour,
           event_type, hour_bucket,
           count(*)::BIGINT AS n_events,
           sum(CAST(value AS DECIMAL(14,4))) AS sum_value
    FROM (SELECT event_type, (hour(ts) // 6)::BIGINT AS hour_bucket, value
          FROM events)
    GROUP BY ROLLUP (event_type, hour_bucket)
    """,
)
def q_events_type_hour_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical subtotals over (event_type → 6-hour bucket): leaf
    groups, per-type subtotals, and the grand total from ONE pass —
    the drill-down backbone (CUBE materializes all 2ᵏ set
    combinations; ROLLUP only the k+1 prefix levels the hierarchy
    needs, so the Expand factor is linear in depth, not exponential).
    DECIMAL sums keep every subtotal exact and order-free; grouping
    flags tell subtotal NULLs from data NULLs."""
    ev = read_table(spark, sf_dir, "events").select(
        "event_type",
        (F.hour("ts") / 6).cast("int").cast("long").alias("hour_bucket"),
        F.col("value").cast("decimal(14,4)").alias("v"),
    )
    return ev.rollup("event_type", "hour_bucket").agg(
        F.grouping("event_type").cast("int").alias("g_type"),
        F.grouping("hour_bucket").cast("int").alias("g_hour"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum("v").alias("sum_value"),
    )
