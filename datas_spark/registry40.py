"""Registry batch 40 — statistical screens: weight-of-evidence (WOE)
feature binning against a binary outcome, and the two-proportion
z-test (A/B experiment readout). Exact-integer contingency counts;
floats appear only in per-row final expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datas_spark.io.sources import read_table
from datas_spark.registry_core import register


@register(
    "value_band_woe",
    oracle="""
    WITH thr AS (
      SELECT round(quantile_cont(value, 0.25), 6) AS q1,
             round(quantile_cont(value, 0.50), 6) AS q2,
             round(quantile_cont(value, 0.75), 6) AS q3
      FROM events
    ), banded AS (
      SELECT CASE WHEN e.value <= t.q1 THEN 1
                  WHEN e.value <= t.q2 THEN 2
                  WHEN e.value <= t.q3 THEN 3
                  ELSE 4 END AS band,
             (e.event_type = 'error')::INT AS bad
      FROM events e CROSS JOIN thr t
    ), cells AS (
      SELECT band,
             count(*) FILTER (WHERE bad = 0)::BIGINT AS n_good,
             count(*) FILTER (WHERE bad = 1)::BIGINT AS n_bad
      FROM banded GROUP BY 1
    ), tot AS (
      SELECT sum(n_good)::BIGINT AS tg, sum(n_bad)::BIGINT AS tb FROM cells
    )
    SELECT c.band, c.n_good, c.n_bad,
           round(ln((c.n_good::DOUBLE / t.tg) / (c.n_bad::DOUBLE / t.tb)), 6)
             AS woe,
           round((c.n_good::DOUBLE / t.tg - c.n_bad::DOUBLE / t.tb)
                 * ln((c.n_good::DOUBLE / t.tg) / (c.n_bad::DOUBLE / t.tb)), 6)
             AS iv_term
    FROM cells c CROSS JOIN tot t
    """,
)
def q_value_band_woe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight of evidence of the event value against the 'error'
    outcome, by value quartile: WOE = ln(%good/%bad) per band plus the
    information-value term — the classic credit-scoring/feature-audit
    screen (does this feature separate the bad outcome at all?).

    Quartile thresholds come from ONE percentile buffer (rounded 6 dp
    before comparison → identical band membership on both engines),
    the contingency cells are exact BIGINT, and the two log
    expressions evaluate per band row."""
    ev = read_table(spark, sf_dir, "events")
    thr = ev.agg(
        *[
            F.round(F.percentile("value", F.lit(p)), 6).alias(f"q{i}")
            for i, p in ((1, 0.25), (2, 0.50), (3, 0.75))
        ]
    )
    band = (
        F.when(F.col("value") <= F.col("q1"), 1)
        .when(F.col("value") <= F.col("q2"), 2)
        .when(F.col("value") <= F.col("q3"), 3)
        .otherwise(4)
    )
    cells = (
        ev.crossJoin(F.broadcast(thr))
        .select(band.alias("band"), (F.col("event_type") == "error").alias("bad"))
        .groupBy("band")
        .agg(
            F.count(F.when(~F.col("bad"), 1)).cast("long").alias("n_good"),
            F.count(F.when(F.col("bad"), 1)).cast("long").alias("n_bad"),
        )
    )
    tot = cells.agg(
        F.sum("n_good").cast("long").alias("tg"),
        F.sum("n_bad").cast("long").alias("tb"),
    )
    pg = F.col("n_good").cast("double") / F.col("tg")
    pb = F.col("n_bad").cast("double") / F.col("tb")
    return cells.crossJoin(F.broadcast(tot)).select(
        "band",
        "n_good",
        "n_bad",
        F.round(F.log(pg / pb), 6).alias("woe"),
        F.round((pg - pb) * F.log(pg / pb), 6).alias("iv_term"),
    )


@register(
    "ab_conversion_ztest",
    oracle="""
    WITH assign AS (
      SELECT user_id, (user_id % 2)::INT AS grp,
             max(CASE WHEN event_type = 'purchase' AND value >= 900
                      THEN 1 ELSE 0 END)::INT AS converted
      FROM events GROUP BY 1
    ), arms AS (
      SELECT grp, count(*)::BIGINT AS n, sum(converted)::BIGINT AS conv
      FROM assign GROUP BY 1
    ), wide AS (
      SELECT max(CASE WHEN grp = 0 THEN n END)::BIGINT AS n_a,
             max(CASE WHEN grp = 0 THEN conv END)::BIGINT AS conv_a,
             max(CASE WHEN grp = 1 THEN n END)::BIGINT AS n_b,
             max(CASE WHEN grp = 1 THEN conv END)::BIGINT AS conv_b
      FROM arms
    )
    SELECT n_a, conv_a, n_b, conv_b,
           round(conv_a::DOUBLE / n_a, 6) AS rate_a,
           round(conv_b::DOUBLE / n_b, 6) AS rate_b,
           round(CASE WHEN (conv_a + conv_b) > 0
                      AND (conv_a + conv_b) < (n_a + n_b) THEN
             (conv_a::DOUBLE / n_a - conv_b::DOUBLE / n_b)
             / sqrt(((conv_a + conv_b)::DOUBLE / (n_a + n_b))
                    * (1 - (conv_a + conv_b)::DOUBLE / (n_a + n_b))
                    * (1.0 / n_a + 1.0 / n_b)) END, 6) AS z_score
    FROM wide
    """,
)
def q_ab_conversion_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test on per-user conversion (did the user ever
    make a high-value purchase, value >= 900) between the user_id-parity
    arms — the A/B experiment readout, pooled-variance form. The z
    score is NULL when pooled conversion is degenerate (0% or 100% —
    zero pooled variance). Per-user conversion is ONE grouped
    max (each user counted once regardless of event count); the two
    arms reduce to a single wide row; everything after is per-row
    float on exact integers."""
    ev = read_table(spark, sf_dir, "events")
    assign = ev.groupBy("user_id").agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("value") >= 900), 1
            ).otherwise(0)
        ).alias("converted")
    ).select((F.col("user_id") % 2).cast("int").alias("grp"), "converted")
    arms = assign.groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("converted").cast("long").alias("conv"),
    )
    wide = arms.agg(
        F.max(F.when(F.col("grp") == 0, F.col("n"))).cast("long").alias("n_a"),
        F.max(F.when(F.col("grp") == 0, F.col("conv"))).cast("long").alias("conv_a"),
        F.max(F.when(F.col("grp") == 1, F.col("n"))).cast("long").alias("n_b"),
        F.max(F.when(F.col("grp") == 1, F.col("conv"))).cast("long").alias("conv_b"),
    )
    ra = F.col("conv_a").cast("double") / F.col("n_a")
    rb = F.col("conv_b").cast("double") / F.col("n_b")
    pool = (F.col("conv_a") + F.col("conv_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    )
    tot_conv = F.col("conv_a") + F.col("conv_b")
    tot_n = F.col("n_a") + F.col("n_b")
    z = F.when(
        (tot_conv > 0) & (tot_conv < tot_n),
        (ra - rb)
        / F.sqrt(pool * (1 - pool) * (1.0 / F.col("n_a") + 1.0 / F.col("n_b"))),
    )
    return wide.select(
        "n_a",
        "conv_a",
        "n_b",
        "conv_b",
        F.round(ra, 6).alias("rate_a"),
        F.round(rb, 6).alias("rate_b"),
        F.round(z, 6).alias("z_score"),
    )
