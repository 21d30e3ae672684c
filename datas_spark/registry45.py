"""Registry batch 45 — temporal ML hygiene and rolling anomaly
detection: embargo-gapped time splits (purged cross-validation),
group-coherent session holdout sampling, and rolling z-score anomaly
flags over the hourly aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from datas_spark.io.sources import read_table
from datas_spark.registry_core import register

_CUTOFF = "2024-01-20"
_EMBARGO_H = 48


@register(
    "temporal_embargo_split",
    oracle=f"""
    SELECT event_id, user_id, ts,
           CASE WHEN ts < TIMESTAMP '{_CUTOFF}' THEN 'train'
                WHEN ts < TIMESTAMP '{_CUTOFF}' + INTERVAL '{_EMBARGO_H} hours'
                THEN 'embargo' ELSE 'test' END AS split
    FROM events
    """,
)
def q_temporal_embargo_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purged temporal split: rows before the cutoff train, rows
    inside the {_EMBARGO_H}-hour embargo window after it are DROPPED
    from both sides (a model with lagged/rolling features computed
    over the boundary would otherwise leak train information into
    test — the purged-CV rule from financial ML), and the rest test.
    Map-only expression; the embargo rows are returned labeled so the
    caller can audit how much data the purge costs."""
    ev = read_table(spark, sf_dir, "events")
    cutoff = F.lit(_CUTOFF).cast("timestamp")
    split = (
        F.when(F.col("ts") < cutoff, "train")
        .when(F.col("ts") < cutoff + F.expr(f"INTERVAL {_EMBARGO_H} HOURS"), "embargo")
        .otherwise("test")
    )
    return ev.select("event_id", "user_id", "ts", split.alias("split"))


@register(
    "session_holdout_sample",
    oracle="""
    SELECT event_id, user_id, event_type
    FROM events
    WHERE ('0x' || substr(md5('holdout' || user_id::VARCHAR), 1, 8))::BIGINT
          % 100 < 10
    """,
)
def q_session_holdout_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-coherent holdout: sample ~10% of USERS (not events) by a
    salted md5 bucket on the user key, keeping every event of a chosen
    user — behavioral eval needs whole sessions, and a per-event
    sample shreds them. Map-only, no shuffle, stable across reruns
    and resizes (hash, never rand); the same discipline as
    `group_safe_split` applied to sampling."""
    ev = read_table(spark, sf_dir, "events")
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("holdout"), F.col("user_id").cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % 100
    )
    return ev.where(bucket < 10).select("event_id", "user_id", "event_type")


_ROLL_W = 24  # trailing hours in the rolling baseline


@register(
    "events_hourly_anomaly",
    oracle=f"""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS h, count(*)::BIGINT AS n
      FROM events GROUP BY 1, 2
    ), rolled AS (
      SELECT event_type, h, n,
             avg(n) OVER w AS mu,
             stddev_samp(n) OVER w AS sd,
             count(*) OVER w AS w_n
      FROM hourly
      WINDOW w AS (PARTITION BY event_type ORDER BY h
                   ROWS BETWEEN {_ROLL_W} PRECEDING AND 1 PRECEDING)
    )
    SELECT event_type, h AS hour, n AS n_events,
           round((n - mu) / sd, 6) AS z
    FROM rolled
    WHERE w_n >= 12 AND sd > 0 AND abs((n - mu) / sd) >= 3
    """,
)
def q_events_hourly_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling anomaly detection: hours whose event count sits ≥ 3
    trailing-window standard deviations from the previous
    {_ROLL_W}-hour baseline, per event type — the volume-spike alarm.

    The window runs over the HOURLY AGGREGATE (≤ |types|·|hours| rows,
    partitioned by type — metadata-scale regardless of event volume),
    never over raw events; baselines need ≥ 12 trailing hours before
    an hour is judged. The rolling frame excludes the current row, so
    a spike cannot suppress its own alarm."""
    ev = read_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hour")
    ).agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(-_ROLL_W, -1)
    )
    rolled = hourly.select(
        "event_type",
        "hour",
        "n_events",
        F.avg("n_events").over(w).alias("__mu"),
        F.stddev_samp("n_events").over(w).alias("__sd"),
        F.count(F.lit(1)).over(w).alias("__wn"),
    )
    z = (F.col("n_events") - F.col("__mu")) / F.col("__sd")
    return (
        rolled.where(
            (F.col("__wn") >= 12) & (F.col("__sd") > 0) & (F.abs(z) >= 3)
        )
        .select("event_type", "hour", "n_events", F.round(z, 6).alias("z"))
    )
