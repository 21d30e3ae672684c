"""Registry batch 28 — categorical association and concentration:
chi-square independence between event type and hour-of-day, and the
top-1% revenue concentration share.

Exact-arithmetic discipline: contingency cells and marginals are
BIGINT; the chi-square and share statistics are per-row float
expressions over those integers (expected counts as ratios of doubles
— products of three marginals overflow int64 at scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datas_spark.io.sources import read_table
from datas_spark.registry_core import register


@register(
    "events_type_hour_chi2",
    oracle="""
    WITH cells AS (
      SELECT event_type, (hour(ts) // 6)::INT AS hour_bucket,
             count(*)::BIGINT AS obs
      FROM events GROUP BY 1, 2
    ), rowm AS (
      SELECT event_type, sum(obs)::BIGINT AS row_tot FROM cells GROUP BY 1
    ), colm AS (
      SELECT hour_bucket, sum(obs)::BIGINT AS col_tot FROM cells GROUP BY 1
    ), grand AS (
      SELECT sum(obs)::BIGINT AS n FROM cells
    )
    SELECT round(sum(
             pow(c.obs::DOUBLE
                 - r.row_tot::DOUBLE * m.col_tot::DOUBLE / g.n::DOUBLE, 2)
             / (r.row_tot::DOUBLE * m.col_tot::DOUBLE / g.n::DOUBLE)), 6)
             AS chi2,
           ((count(DISTINCT c.event_type) - 1)
            * (count(DISTINCT c.hour_bucket) - 1))::BIGINT AS dof
    FROM cells c
    JOIN rowm r USING (event_type) JOIN colm m USING (hour_bucket)
    CROSS JOIN grand g
    """,
)
def q_events_type_hour_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square test of independence between event type and
    6-hour time-of-day bucket: Σ (obs − exp)² / exp over the
    |types|×4 contingency table, with the degrees of freedom — the
    standard "is behavior time-dependent?" screen.

    The table and all marginals are exact BIGINT from ONE grouped pass;
    expected counts are computed as ratios of doubles (a row×col×grand
    integer product would overflow int64 at corpus scale). The final
    statistic sums ≤ |types|·4 per-cell terms in a single tiny
    aggregate; marginals broadcast."""
    ev = read_table(spark, sf_dir, "events")
    cells = ev.groupBy(
        "event_type", (F.hour("ts") / 6).cast("int").alias("hour_bucket")
    ).agg(F.count("*").cast("long").alias("obs"))
    rowm = cells.groupBy("event_type").agg(
        F.sum("obs").cast("long").alias("row_tot")
    )
    colm = cells.groupBy("hour_bucket").agg(
        F.sum("obs").cast("long").alias("col_tot")
    )
    grand = cells.agg(F.sum("obs").cast("long").alias("n"))
    exp = (
        F.col("row_tot").cast("double")
        * F.col("col_tot").cast("double")
        / F.col("n").cast("double")
    )
    return (
        cells.join(F.broadcast(rowm), "event_type")
        .join(F.broadcast(colm), "hour_bucket")
        .crossJoin(F.broadcast(grand))
        .agg(
            F.round(
                F.sum(F.pow(F.col("obs").cast("double") - exp, 2) / exp), 6
            ).alias("chi2"),
            (
                (F.count_distinct("event_type") - 1)
                * (F.count_distinct("hour_bucket") - 1)
            )
            .cast("long")
            .alias("dof"),
        )
    )


_CONC_Q = 0.99  # threshold quantile: "the top 1%"


@register(
    "revenue_concentration",
    oracle=f"""
    WITH per_cust AS (
      SELECT o_custkey, sum(o_totalprice::DECIMAL(18,2)) AS rev
      FROM orders GROUP BY o_custkey
    ), thr AS (
      SELECT round(quantile_cont(rev::DOUBLE, {_CONC_Q}), 6) AS t FROM per_cust
    )
    SELECT t.t AS threshold,
           count(*) FILTER (WHERE p.rev::DOUBLE >= t.t)::BIGINT AS top_customers,
           count(*)::BIGINT AS all_customers,
           round(sum(CASE WHEN p.rev::DOUBLE >= t.t THEN p.rev
                     ELSE 0::DECIMAL(18,2) END)::DOUBLE
                 / sum(p.rev)::DOUBLE * 100.0, 6) AS top_share_pct
    FROM per_cust p CROSS JOIN thr t
    GROUP BY t.t
    """,
)
def q_revenue_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue concentration: what share of total revenue comes from
    customers at or above the p99 of per-customer revenue — the
    Pareto/whale metric, computed WITHOUT ranking customers (a global
    rank over per-customer rows funnels 10⁹ rows through one reducer
    at scale; the percentile threshold + conditional sum is one
    combinable aggregate each).

    Per-customer revenue is DECIMAL-exact; the threshold is the exact
    interpolated percentile rounded to 6 dp before the >= comparison,
    so the top-set membership is identical on both engines; both share
    sums stay DECIMAL (order-independent), divided once at the end."""
    orders = read_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev")
    )
    thr = per_cust.agg(
        F.round(F.percentile(F.col("rev").cast("double"), F.lit(_CONC_Q)), 6).alias(
            "t"
        )
    )
    revd = F.col("rev").cast("double")
    top = revd >= F.col("t")
    return (
        per_cust.crossJoin(F.broadcast(thr))
        .groupBy(F.col("t").alias("threshold"))
        .agg(
            F.count(F.when(top, 1)).cast("long").alias("top_customers"),
            F.count("*").cast("long").alias("all_customers"),
            F.round(
                F.sum(
                    F.when(top, F.col("rev")).otherwise(
                        F.lit(0).cast("decimal(18,2)")
                    )
                ).cast("double")
                / F.sum("rev").cast("double")
                * 100.0,
                6,
            ).alias("top_share_pct"),
        )
    )
