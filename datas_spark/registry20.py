"""Registry batch 20 — time-series analytics over event volumes:
per-key OLS trend slope, CUSUM change-point detection, and first-order
Markov transition estimation between event types.

All three follow the exact-integer discipline of registry18's
correlation query: per-hour counts are BIGINT, every cross-row moment
(Σx, Σy, Σxy, cumulative sums, totals) is exact integer arithmetic,
and the only float operation is a final single-expression division —
bit-reproducible against the DuckDB twin with no summation-order
hazard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from datas_spark.io.sources import read_table
from datas_spark.registry_core import register

# events span 2024-01; hour indices are exact small ints from this epoch
_EPOCH = "2024-01-01 00:00:00"


def _hourly_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    return ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.count("*").cast("long").alias("y"))


@register(
    "events_type_trend",
    oracle=f"""
    WITH hours AS (
      SELECT event_type, date_trunc('hour', ts) AS h, count(*)::BIGINT AS y
      FROM events GROUP BY 1, 2
    ), pts AS (
      SELECT event_type,
             date_diff('hour', TIMESTAMP '{_EPOCH}', h)::BIGINT AS x, y
      FROM hours
    ), s AS (
      SELECT event_type, count(*)::BIGINT AS n,
             sum(x)::BIGINT AS sx, sum(y)::BIGINT AS sy,
             sum(x * x)::BIGINT AS sxx, sum(x * y)::BIGINT AS sxy
      FROM pts GROUP BY event_type
    )
    SELECT event_type, n,
           round((n * sxy - sx * sy)::DOUBLE
                 / (n * sxx - sx * sx)::DOUBLE, 6) AS slope_per_hour
    FROM s ORDER BY event_type
    """,
)
def q_events_type_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type OLS trend of hourly volume: slope (events/hour²)
    of the least-squares line through (hour_index, hourly_count).

    The closed form ``(nΣxy − ΣxΣy) / (nΣx² − (Σx)²)`` runs on exact
    BIGINT moments — the distributed-safe way to regress on counts
    (same trick as `events_type_correlation`); one grouped pass over
    events, one 5-group reduction. Hour indices are integer diffs from
    a fixed epoch, so x is timezone-free and small."""
    pts = _hourly_counts(spark, sf_dir).select(
        "event_type",
        F.expr(f"timestampdiff(HOUR, TIMESTAMP '{_EPOCH}', h)")
        .cast("long")
        .alias("x"),
        "y",
    )
    s = pts.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    return s.select(
        "event_type", "n", F.round(num / den, 6).alias("slope_per_hour")
    ).orderBy("event_type")


@register(
    "events_type_changepoint",
    oracle="""
    WITH hours AS (
      SELECT event_type, date_trunc('hour', ts) AS h, count(*)::BIGINT AS y
      FROM events GROUP BY 1, 2
    ), walk AS (
      SELECT event_type, h,
             row_number() OVER w AS i,
             sum(y) OVER (PARTITION BY event_type ORDER BY h
                          ROWS UNBOUNDED PRECEDING)::BIGINT AS cum,
             sum(y) OVER (PARTITION BY event_type)::BIGINT AS tot,
             count(*) OVER (PARTITION BY event_type)::BIGINT AS n
      FROM hours WINDOW w AS (PARTITION BY event_type ORDER BY h)
    ), dev AS (
      SELECT event_type, h, n,
             abs(n * cum - i * tot)::BIGINT AS deviation,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY abs(n * cum - i * tot) DESC, h ASC)
               AS rk
      FROM walk
    )
    SELECT event_type, h AS changepoint_hour, deviation, n AS n_hours
    FROM dev WHERE rk = 1 ORDER BY event_type
    """,
)
def q_events_type_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point per event type: the hour where the cumulative
    deviation of hourly volume from its own mean peaks — the classic
    offline CUSUM argmax ``argmax_i |Σ_{j≤i}(y_j − ȳ)|``.

    Scaled through by n (``|n·cum_i − i·tot|``) so the walk stays in
    exact BIGINT — no float mean, no accumulation drift. Windows are
    PARTITIONED BY event_type (per-key local sorts over ~720 hourly
    rows per type; never a global sort), and the argmax is a rank-1
    filter with a deterministic earliest-hour tie-break."""
    w = Window.partitionBy("event_type").orderBy("h")
    walk = _hourly_counts(spark, sf_dir).select(
        "event_type",
        "h",
        F.row_number().over(w).alias("i"),
        F.sum("y").over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("long").alias("cum"),
        F.sum("y").over(Window.partitionBy("event_type")).cast("long").alias("tot"),
        F.count(F.lit(1)).over(Window.partitionBy("event_type")).cast("long").alias("n"),
    )
    dev = walk.select(
        "event_type",
        "h",
        "n",
        F.abs(F.col("n") * F.col("cum") - F.col("i") * F.col("tot"))
        .cast("long")
        .alias("deviation"),
    )
    rk = Window.partitionBy("event_type").orderBy(F.desc("deviation"), F.asc("h"))
    return (
        dev.withColumn("rk", F.row_number().over(rk))
        .where("rk = 1")
        .select(
            "event_type",
            F.col("h").alias("changepoint_hour"),
            "deviation",
            F.col("n").alias("n_hours"),
        )
        .orderBy("event_type")
    )


@register(
    "event_type_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type AS src,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS dst
      FROM events
    ), pairs AS (
      SELECT src, dst, count(*)::BIGINT AS cnt
      FROM seq WHERE dst IS NOT NULL GROUP BY src, dst
    )
    SELECT src, dst, cnt,
           round(cnt::DOUBLE
                 / sum(cnt) OVER (PARTITION BY src)::DOUBLE, 6) AS prob
    FROM pairs ORDER BY src, dst
    """,
)
def q_event_type_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix between event types: for
    each user's event sequence (ordered by ts with event_id as the
    total-order tie-break), count src→dst adjacencies and normalize
    per source row — the behavioral model behind next-action
    prediction and anomaly scoring.

    Scale shape: the lead() window is partitioned by user_id (per-user
    local sorts); the pair count collapses to ≤ |types|² rows before
    the per-src normalization window, which therefore runs on a tiny
    frame. One shuffle on user_id, one on the 25-row pair table."""
    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("src"),
        F.lead("event_type").over(w).alias("dst"),
    )
    pairs = (
        seq.where(F.col("dst").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    tot = Window.partitionBy("src")
    return pairs.select(
        "src",
        "dst",
        "cnt",
        F.round(
            F.col("cnt").cast("double") / F.sum("cnt").over(tot).cast("double"), 6
        ).alias("prob"),
    ).orderBy("src", "dst")
