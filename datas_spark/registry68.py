"""Registry batch 68 — leakage-safe lag/rolling featurizer
(`timeseries.lag_features`) over the per-user daily series.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datas_spark.io.sources import read_table
from datas_spark.operators.timeseries import lag_features
from datas_spark.registry_core import register


@register(
    "user_daily_lag_features",
    oracle="""
    WITH daily AS (
      SELECT user_id, ts::DATE AS day,
             sum(round(value * 100)::BIGINT)::BIGINT AS cents
      FROM events GROUP BY 1, 2
    )
    SELECT user_id, day::VARCHAR AS day, cents,
           lag(cents, 1) OVER w AS lag_1,
           lag(cents, 7) OVER w AS lag_7,
           sum(cents) OVER (w ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
             AS roll7_sum,
           round(avg(cents) OVER (w ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING), 6)
             AS roll7_mean
    FROM daily
    WINDOW w AS (PARTITION BY user_id ORDER BY day)
    QUALIFY user_id % 29 = 0
    """,
)
def q_user_daily_lag_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user daily feature rows: previous-day and previous-week
    lags plus the trailing-7-row sum/mean EXCLUDING the current day —
    the leakage-safe featurizer convention (step t sees strictly-prior
    steps only). All feature columns share one (user, day) exchange +
    sort; exact integer-cents series. The mod-29 user slice bounds
    driver output after the windows run on everyone."""
    ev = read_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "user_id", F.col("ts").cast("date").alias("day")
    ).agg(F.sum(F.round(F.col("value") * 100).cast("long")).cast("long").alias("cents"))
    out = lag_features(
        daily, "user_id", "day", "cents", lags=[1, 7], rolling_windows=[7]
    )
    return out.where(F.col("user_id") % 29 == 0).select(
        "user_id",
        F.col("day").cast("string").alias("day"),
        "cents",
        "lag_1",
        "lag_7",
        "roll7_sum",
        F.round("roll7_mean", 6).alias("roll7_mean"),
    )
