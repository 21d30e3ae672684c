"""Registry batch 65 — model-eval completions: sliced AUC, decile
lift/cumulative gains, and expected calibration error.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datas_spark.io.sources import read_table
from datas_spark.operators import evalmetrics as EM
from datas_spark.operators.scoring import hash_unit_interval
from datas_spark.registry_core import register

_LAB_SQL = """
      SELECT round(value, 2) AS s, ts,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
      FROM events WHERE event_type IN ('purchase', 'view') AND value IS NOT NULL
"""


@register(
    "purchase_value_auc_by_dow",
    oracle=f"""
    WITH lab AS ({_LAB_SQL}
    ), g AS (
      SELECT date_part('dow', ts)::INT AS dow, s,
             count(*) FILTER (y = 1) AS pos, count(*) FILTER (y = 0) AS neg
      FROM lab GROUP BY 1, 2
    ), c AS (
      SELECT dow, pos, neg,
             pos * (2 * coalesce(sum(neg) OVER (PARTITION BY dow
               ORDER BY s ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               + neg) AS c2
      FROM g
    )
    SELECT dow, sum(pos)::BIGINT AS n_pos, sum(neg)::BIGINT AS n_neg,
           round(sum(c2) / (2.0 * sum(pos) * sum(neg)), 6) AS auc
    FROM c GROUP BY dow
    """,
)
def q_purchase_value_auc_by_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliced AUC: the purchase-vs-view value discrimination per
    day-of-week — the QA slicing that catches a slice where an overall
    AUC hides anti-predictive behavior. The cumulative window
    partitions on the slice, so the distinct-score frames stay
    per-slice sized."""
    ev = read_table(spark, sf_dir, "events")
    lab = ev.where(F.col("event_type").isin("purchase", "view")).select(
        "value",
        (F.dayofweek("ts") - 1).cast("int").alias("dow"),
        (F.col("event_type") == "purchase").cast("int").alias("y"),
    )
    return EM.binary_auc(lab, "value", "y", by=["dow"], precision=2)


@register(
    "value_lift_table",
    oracle=f"""
    WITH lab AS ({_LAB_SQL}
    ), g0 AS (
      SELECT s, count(*)::BIGINT AS n, count(*) FILTER (y = 1)::BIGINT AS pos
      FROM lab GROUP BY s
    ), g AS (
      SELECT s, n, pos,
             coalesce(sum(n) OVER (ORDER BY s DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
      FROM g0
    ), tot AS (
      SELECT sum(n)::BIGINT AS tn, sum(pos)::BIGINT AS tp FROM g
    ), binned AS (
      SELECT floor((cb * 10) / tn::DOUBLE)::INT AS band, n, pos, tn, tp
      FROM g CROSS JOIN tot
    ), per AS (
      SELECT band, sum(n)::BIGINT AS n, sum(pos)::BIGINT AS n_pos,
             any_value(tn) AS tn, any_value(tp) AS tp
      FROM binned GROUP BY band
    )
    SELECT band, n, n_pos,
           round(n_pos / n::DOUBLE, 6) AS response_rate,
           round((n_pos / n::DOUBLE) / (tp / tn::DOUBLE), 6) AS lift,
           round(sum(n_pos) OVER (ORDER BY band
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / tp::DOUBLE, 6)
             AS cum_gain
    FROM per
    """,
)
def q_value_lift_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile lift & cumulative gains of event value against the
    purchase label — the targeting-table companion to AUC. Band cuts
    come from a cumulative count over the distinct-score aggregate
    (identical double math in both engines), never a raw-row ntile.
    precision=2 enforces the distinct-score bound in both engines."""
    ev = read_table(spark, sf_dir, "events")
    lab = ev.where(F.col("event_type").isin("purchase", "view")).select(
        "value", (F.col("event_type") == "purchase").cast("int").alias("y")
    )
    return EM.lift_table(lab, "value", "y", bins=10, precision=2)


@register(
    "proxy_calibration_ece",
    oracle="""
    WITH lab AS (
      SELECT ('0x' || substr(md5('cal:' || event_id::VARCHAR), 1, 8))::BIGINT
               / 4294967296.0 AS p,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
      FROM events WHERE event_type IN ('purchase', 'view')
    ), g AS (
      SELECT least(floor(p * 10)::INT, 9) AS bin,
             count(*)::BIGINT AS n,
             sum(round(p * 1000000000)::BIGINT)::BIGINT AS sum_pe9,
             sum(y)::BIGINT AS n_pos
      FROM lab GROUP BY 1
    ), tot AS (SELECT sum(n)::BIGINT AS tn FROM g
    )
    SELECT bin, n, n_pos,
           round(sum_pe9 / n / 1e9, 6) AS mean_pred,
           round(n_pos / n::DOUBLE, 6) AS obs_rate,
           round(sum(abs(sum_pe9 / n / 1e9 - n_pos / n::DOUBLE) * n / tn)
                 OVER (), 6) AS ece
    FROM g CROSS JOIN tot
    """,
)
def q_proxy_calibration_ece(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expected Calibration Error of the md5-proxy score against the
    purchase label (the model boundary's standard stand-in): per-bin
    reliability rows + the mass-weighted ECE. Bin means reduce from
    exact e9-scaled integers, so they are engine-identical."""
    ev = read_table(spark, sf_dir, "events")
    lab = ev.where(F.col("event_type").isin("purchase", "view")).select(
        hash_unit_interval(
            F.concat(F.lit("cal:"), F.col("event_id").cast("string"))
        ).alias("p"),
        (F.col("event_type") == "purchase").cast("int").alias("y"),
    )
    return EM.calibration_ece(lab, "p", "y", bins=10)
