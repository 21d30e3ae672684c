"""Registry batch 67 — survival analysis: Kaplan–Meier churn curve
with right-censoring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from datas_spark.io.sources import read_table
from datas_spark.registry_core import register

# users whose last event falls in the final days of the observation
# window are CENSORED (still alive at cutoff), not churned
_KM_CENSOR_FROM = "2024-01-28"


@register(
    "churn_survival_curve",
    oracle=f"""
    WITH per_user AS (
      SELECT user_id,
             date_diff('day', min(ts), max(ts))::BIGINT AS t,
             CASE WHEN max(ts) >= TIMESTAMP '{_KM_CENSOR_FROM}'
                  THEN 0 ELSE 1 END AS churned
      FROM events GROUP BY user_id
    ), days AS (
      SELECT t, count(*)::BIGINT AS n_exit,
             count(*) FILTER (churned = 1)::BIGINT AS d
      FROM per_user GROUP BY t
    ), risk AS (
      SELECT t, d,
             sum(n_exit) OVER (ORDER BY t DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_risk
      FROM days
    ), terms AS (
      SELECT t, d, n_risk,
             CASE WHEN d > 0 THEN ln((n_risk - d) / n_risk::DOUBLE)
                  ELSE 0.0 END AS lnterm
      FROM risk
    ), arr AS (
      SELECT list(struct_pack(t := t, lnterm := lnterm) ORDER BY t) AS a
      FROM terms
    )
    SELECT r.t, r.d, r.n_risk::BIGINT AS n_risk,
           round(exp(list_reduce(
             list_prepend(0.0, list_transform(
               list_filter(arr.a, x -> x.t <= r.t), x -> x.lnterm)),
             (acc, v) -> acc + v)), 6) AS survival
    FROM terms r CROSS JOIN arr
    """,
)
def q_churn_survival_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan–Meier survival curve for user lifetime (days between
    first and last event), right-censoring users still active in the
    final window — survival analysis done relationally: S(t) =
    Π_(t'≤t) (1 − d/n_risk), evaluated as an exp of an ORDERED ln-fold
    over the collected day array, so the float accumulation order is
    identical in both engines (the BM25 term-fold trick).

    Scale shape: one per-user aggregate, one per-day aggregate (≤
    observation-window days rows), windows and folds only ever touch
    the tiny day frame."""
    ev = read_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.datediff(F.max("ts"), F.min("ts")).cast("long").alias("t"),
        F.when(F.max("ts") >= _KM_CENSOR_FROM, 0).otherwise(1).alias("churned"),
    )
    days = per_user.groupBy("t").agg(
        F.count(F.lit(1)).alias("n_exit"),
        F.count_if(F.col("churned") == 1).alias("d"),
    )
    w = Window.orderBy(F.desc("t")).rowsBetween(Window.unboundedPreceding, 0)
    risk = days.select("t", "d", F.sum("n_exit").over(w).alias("n_risk"))
    lnterm = F.when(
        F.col("d") > 0,
        F.log((F.col("n_risk") - F.col("d")) / F.col("n_risk").cast("double")),
    ).otherwise(F.lit(0.0))
    terms = risk.select("t", "d", "n_risk", lnterm.alias("lnterm"))
    arr = terms.agg(
        F.sort_array(F.collect_list(F.struct("t", "lnterm"))).alias("a")
    )
    folded = terms.join(F.broadcast(arr)).select(
        "t",
        "d",
        F.col("n_risk").cast("long").alias("n_risk"),
        F.round(
            F.exp(
                F.aggregate(
                    F.filter(F.col("a"), lambda x: x["t"] <= F.col("t")),
                    F.lit(0.0),
                    lambda acc, x: acc + x["lnterm"],
                )
            ),
            6,
        ).alias("survival"),
    )
    return folded
