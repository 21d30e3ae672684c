"""Registry batch 49 — ABC revenue classification (the 80/95 cumulative
cut) and funnel time-to-convert percentiles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from datas_spark.io.sources import read_table
from datas_spark.operators.events import funnel_stage_times
from datas_spark.registry_core import register


@register(
    "part_abc_classification",
    oracle="""
    WITH per_part AS (
      SELECT l_partkey,
             sum(round(l_extendedprice * 100)::BIGINT
                 * (100 - round(l_discount * 100)::BIGINT)) AS rev_e4
      FROM lineitem GROUP BY 1
    ), ranked AS (
      SELECT l_partkey, rev_e4,
             sum(rev_e4) OVER (ORDER BY rev_e4 DESC, l_partkey ASC
                               ROWS UNBOUNDED PRECEDING) AS cum_e4,
             sum(rev_e4) OVER () AS tot_e4
      FROM per_part
    ), classed AS (
      SELECT l_partkey,
             CASE WHEN cum_e4 * 100 <= tot_e4 * 80 THEN 'A'
                  WHEN cum_e4 * 100 <= tot_e4 * 95 THEN 'B'
                  ELSE 'C' END AS abc_class,
             rev_e4
      FROM ranked
    )
    SELECT abc_class, count(*)::BIGINT AS n_parts,
           round(sum(rev_e4)::DOUBLE / max(tot) * 100, 6) AS revenue_share_pct
    FROM classed CROSS JOIN (SELECT sum(rev_e4) AS tot FROM per_part) t
    GROUP BY abc_class
    """,
)
def q_part_abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC inventory classification: parts sorted by revenue, class A
    until 80% of cumulative revenue, B until 95%, C after — reported
    as class sizes and realized shares. Revenue is the exact e4-integer
    unit (`important_part_value`'s discipline), the cumulative runs
    over the PER-PART AGGREGATE (a partition-less window is legitimate
    there — it orders |parts| rollup rows, not lineitems; the plan
    gate's aggregate-below rule), and class membership compares
    integers (`cum·100 ≤ tot·80`), never float shares.

    At part cardinalities where even the rollup frame strains one
    reducer (10¹⁰ SKUs), swap the cumulative window for the
    range-exchange + per-partition prefix + broadcast-offset
    construction `selection.skew_resistant_rank` already implements
    for ranks — identical output, no single-partition sort."""
    li = read_table(spark, sf_dir, "lineitem")
    rev_e4 = F.round(F.col("l_extendedprice") * 100).cast("long") * (
        F.lit(100) - F.round(F.col("l_discount") * 100).cast("long")
    )
    per_part = li.groupBy("l_partkey").agg(F.sum(rev_e4).alias("rev_e4"))
    w = Window.orderBy(F.col("rev_e4").desc(), F.col("l_partkey").asc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    wt = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = per_part.select(
        "l_partkey",
        "rev_e4",
        F.sum("rev_e4").over(w).alias("cum_e4"),
        F.sum("rev_e4").over(wt).alias("tot_e4"),
    )
    abc = (
        F.when(F.col("cum_e4") * 100 <= F.col("tot_e4") * 80, "A")
        .when(F.col("cum_e4") * 100 <= F.col("tot_e4") * 95, "B")
        .otherwise("C")
    )
    return (
        ranked.select(abc.alias("abc_class"), "rev_e4", "tot_e4")
        .groupBy("abc_class")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_parts"),
            F.round(
                F.sum("rev_e4").cast("double") / F.max("tot_e4").cast("double") * 100,
                6,
            ).alias("revenue_share_pct"),
        )
    )


@register(
    "funnel_time_to_convert",
    oracle="""
    WITH s1 AS (
      SELECT user_id, min(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ), s2 AS (
      SELECT e.user_id, min(e.ts) AS t2
      FROM events e JOIN s1 ON s1.user_id = e.user_id
      WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY e.user_id
    ), s3 AS (
      SELECT e.user_id, min(e.ts) AS t3
      FROM events e JOIN s2 ON s2.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY e.user_id
    ), conv AS (
      SELECT s1.user_id,
             (epoch_us(s3.t3) - epoch_us(s1.t1)) AS us
      FROM s1 JOIN s3 USING (user_id)
    )
    SELECT count(*)::BIGINT AS n_converted,
           round(quantile_cont(us::DOUBLE, 0.5) / 3.6e9, 6) AS median_hours,
           round(quantile_cont(us::DOUBLE, 0.9) / 3.6e9, 6) AS p90_hours
    FROM conv
    """,
)
def q_funnel_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert through the view→click→purchase funnel: median
    and p90 hours from the first view to the first ordered purchase,
    over converting users. The stage chain reuses `funnel_stage_times`
    (one user_id shuffle key throughout); latencies are exact integer
    microseconds; the percentiles run in one combinable buffer over
    the ≤|users| converted frame."""
    ev = read_table(spark, sf_dir, "events")
    stage0, _stage1, stage2 = funnel_stage_times(ev, ["view", "click", "purchase"])
    us = F.unix_micros(F.col("t2").cast("timestamp")) - F.unix_micros(
        F.col("t0").cast("timestamp")
    )
    conv = stage0.join(stage2, "user_id").select(us.cast("double").alias("us"))
    return conv.agg(
        F.count(F.lit(1)).cast("long").alias("n_converted"),
        F.round(F.percentile("us", F.lit(0.5)) / 3.6e9, 6).alias("median_hours"),
        F.round(F.percentile("us", F.lit(0.9)) / 3.6e9, 6).alias("p90_hours"),
    )
