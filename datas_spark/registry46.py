"""Registry batch 46 — change-data observability and seasonality:
per-column churn between table snapshots (which fields actually move
between pipeline runs) and the lag-24h autocorrelation of hourly
volume (how seasonal each event type is).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datas_spark.io.sources import read_table
from datas_spark.registry_core import register

# synthetic snapshot pair over customer: %13 keys dropped, %7 balances
# bumped, %11 segments rewritten — three disjoint-ish planted changes
_SNAP_SQL = """
    old_snap AS (
      SELECT c_custkey AS k, c_name, c_acctbal, c_mktsegment FROM customer
    ), new_snap AS (
      SELECT c_custkey AS k, c_name,
             CASE WHEN c_custkey % 7 = 0 THEN c_acctbal + 100.0
                  ELSE c_acctbal END AS c_acctbal,
             CASE WHEN c_custkey % 11 = 0 THEN 'CHURNED'
                  ELSE c_mktsegment END AS c_mktsegment
      FROM customer WHERE c_custkey % 13 != 0
    )
"""


@register(
    "snapshot_column_churn",
    oracle=f"""
    WITH {_SNAP_SQL}
    SELECT count(CASE WHEN o.k IS NULL THEN 1 END)::BIGINT AS n_added,
           count(CASE WHEN n.k IS NULL THEN 1 END)::BIGINT AS n_removed,
           count(CASE WHEN o.k IS NOT NULL AND n.k IS NOT NULL
                       AND (o.c_name IS DISTINCT FROM n.c_name
                         OR o.c_acctbal IS DISTINCT FROM n.c_acctbal
                         OR o.c_mktsegment IS DISTINCT FROM n.c_mktsegment)
                      THEN 1 END)::BIGINT AS n_changed,
           count(CASE WHEN o.k IS NOT NULL AND n.k IS NOT NULL
                       AND o.c_name IS DISTINCT FROM n.c_name
                      THEN 1 END)::BIGINT AS chg_name,
           count(CASE WHEN o.k IS NOT NULL AND n.k IS NOT NULL
                       AND o.c_acctbal IS DISTINCT FROM n.c_acctbal
                      THEN 1 END)::BIGINT AS chg_acctbal,
           count(CASE WHEN o.k IS NOT NULL AND n.k IS NOT NULL
                       AND o.c_mktsegment IS DISTINCT FROM n.c_mktsegment
                      THEN 1 END)::BIGINT AS chg_mktsegment
    FROM old_snap o FULL OUTER JOIN new_snap n USING (k)
    """,
)
def q_snapshot_column_churn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-COLUMN churn between two snapshots of a keyed table: row
    adds/removes/changes plus a changed-count per column — the report
    that distinguishes "the balance feed re-stated history" from "the
    segmentation model re-labeled everyone". One full-outer key join,
    NULL-safe (`eqNullSafe`) column comparisons, one 1-row aggregate;
    at scale the join is the only shuffle and every comparison is
    map-side."""
    cust = read_table(spark, sf_dir, "customer")
    old = cust.select(
        F.col("c_custkey").alias("k"), "c_name", "c_acctbal", "c_mktsegment"
    )
    new = (
        cust.where(F.col("c_custkey") % 13 != 0)
        .select(
            F.col("c_custkey").alias("k"),
            "c_name",
            F.when(
                F.col("c_custkey") % 7 == 0, F.col("c_acctbal") + 100.0
            ).otherwise(F.col("c_acctbal")).alias("c_acctbal"),
            F.when(F.col("c_custkey") % 11 == 0, F.lit("CHURNED"))
            .otherwise(F.col("c_mktsegment"))
            .alias("c_mktsegment"),
        )
    )
    cols = ("c_name", "c_acctbal", "c_mktsegment")
    # explicit presence markers: a row may legitimately hold NULLs, so
    # side-presence must never be inferred from payload columns
    o = old.select("k", F.lit(1).alias("__o"), *[F.col(c).alias(f"o_{c}") for c in cols])
    n = new.select("k", F.lit(1).alias("__n"), *[F.col(c).alias(f"n_{c}") for c in cols])
    j = o.join(n, "k", "full_outer")
    present_old = F.col("__o").isNotNull()
    present_new = F.col("__n").isNotNull()

    def diff(c: str) -> F.Column:
        return present_old & present_new & ~F.col(f"o_{c}").eqNullSafe(F.col(f"n_{c}"))

    any_diff = diff("c_name") | diff("c_acctbal") | diff("c_mktsegment")
    return j.agg(
        F.count(F.when(~present_old, 1)).cast("long").alias("n_added"),
        F.count(F.when(~present_new, 1)).cast("long").alias("n_removed"),
        F.count(F.when(any_diff, 1)).cast("long").alias("n_changed"),
        F.count(F.when(diff("c_name"), 1)).cast("long").alias("chg_name"),
        F.count(F.when(diff("c_acctbal"), 1)).cast("long").alias("chg_acctbal"),
        F.count(F.when(diff("c_mktsegment"), 1)).cast("long").alias("chg_mktsegment"),
    )


@register(
    "events_seasonality_strength",
    oracle="""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS h, count(*)::BIGINT AS n
      FROM events GROUP BY 1, 2
    ), lagged AS (
      SELECT a.event_type, a.n AS x, b.n AS y
      FROM hourly a JOIN hourly b
        ON a.event_type = b.event_type AND b.h = a.h + INTERVAL '24 hours'
    )
    SELECT event_type, count(*)::BIGINT AS n_pairs,
           round((count(*) * sum(x * y) - sum(x) * sum(y))
                 / (sqrt(count(*) * sum(x * x) - sum(x) * sum(x))
                    * sqrt(count(*) * sum(y * y) - sum(y) * sum(y))), 6)
             AS lag24_corr
    FROM lagged GROUP BY event_type
    HAVING count(*) >= 48
       AND (count(*) * sum(x * x) - sum(x) * sum(x)) > 0
       AND (count(*) * sum(y * y) - sum(y) * sum(y)) > 0
    """,
)
def q_events_seasonality_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily-seasonality strength per event type: Pearson correlation
    of hourly volume with itself 24 hours earlier. Near 1 = strong
    daily rhythm; near 0 = arrival noise — the number that decides
    whether the anomaly detector's baseline should be
    time-of-day-matched or plain rolling.

    The self-join aligns hour h with h+24 on the HOURLY aggregate
    (metadata-scale); all five moments are exact integer sums, the
    correlation is one per-type float expression, and degenerate
    (zero-variance or short) series drop out via the exact-integer
    HAVING guards."""
    ev = read_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    a = hourly.select("event_type", F.col("h").alias("ha"), F.col("n").alias("x"))
    b = hourly.select(
        "event_type", F.col("h").alias("hb"), F.col("n").alias("y")
    )
    lagged = a.join(
        b,
        (a["event_type"] == b["event_type"])
        & (F.col("hb") == F.col("ha") + F.expr("INTERVAL 24 HOURS")),
    ).select(a["event_type"], "x", "y")
    nn = F.count(F.lit(1))
    sx, sy = F.sum("x"), F.sum("y")
    sxx = F.sum(F.col("x") * F.col("x"))
    syy = F.sum(F.col("y") * F.col("y"))
    sxy = F.sum(F.col("x") * F.col("y"))
    varx = nn * sxx - sx * sx
    vary = nn * syy - sy * sy
    return (
        lagged.groupBy("event_type")
        .agg(
            nn.cast("long").alias("n_pairs"),
            F.round(
                (nn * sxy - sx * sy).cast("double")
                / (F.sqrt(varx.cast("double")) * F.sqrt(vary.cast("double"))),
                6,
            ).alias("lag24_corr"),
            varx.alias("__vx"),
            vary.alias("__vy"),
        )
        .where(
            (F.col("n_pairs") >= 48) & (F.col("__vx") > 0) & (F.col("__vy") > 0)
        )
        .drop("__vx", "__vy")
    )
