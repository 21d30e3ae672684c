r"""Query registry, batch 9 (round 3): event-analytics depth — session
path mining, value histograms, per-group percentile summaries.

Imported by datas_spark.registry for its side effects (registrations).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from datas_spark.io.sources import read_table
from datas_spark.registry_core import register


@register(
    "session_paths",
    oracle="""
    WITH o AS (
      SELECT user_id, ts, event_id, event_type,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
      FROM events
    ), marked AS (
      SELECT *, CASE WHEN prev IS NULL OR ts - prev >= INTERVAL '5 minutes'
                     THEN 1 ELSE 0 END AS new_s
      FROM o
    ), sess AS (
      SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS sid
      FROM marked
    ), paths AS (
      SELECT user_id, sid,
             string_agg(event_type, '>' ORDER BY ts, event_id) AS path
      FROM sess GROUP BY user_id, sid
    )
    SELECT path, count(*) AS n_sessions
    FROM paths GROUP BY path
    ORDER BY n_sessions DESC, path ASC LIMIT 20
    """,
)
def q_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Path mining: the 20 most common within-session event-type
    sequences (5-min gap sessions) — the funnel-discovery rollup.
    Session ids via the lag/cumsum construction (one shuffle on
    user_id, both windows share the sort); paths assemble with a
    sort-free collect_list + array_sort per session (deterministic
    (ts, event_id) tie-break); TakeOrdered for the limit."""
    ev = read_table(spark, sf_dir, "events")
    ts_s = F.col("ts").cast("timestamp").cast("double")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag(F.col("ts")).over(w)
    new_s = F.when(
        prev.isNull()
        | (ts_s - prev.cast("timestamp").cast("double") >= 300.0),
        1,
    ).otherwise(0)
    sess = ev.withColumn(
        "__sid",
        F.sum(new_s).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    paths = sess.groupBy("user_id", "__sid").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("ts", "event_id", "event_type"))
                ),
                lambda s: s["event_type"],
            ),
            ">",
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .orderBy(F.col("n_sessions").desc(), F.col("path").asc())
        .limit(20)
    )


@register(
    "events_value_histogram",
    oracle="""
    SELECT event_type,
           floor(value / 50.0)::BIGINT AS bucket,
           count(*) AS n,
           round(min(value), 4) AS lo,
           round(max(value), 4) AS hi
    FROM events GROUP BY event_type, bucket
    """,
)
def q_events_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width value histogram per event type (the profiling pass
    before choosing join/bucket boundaries): one combinable aggregate,
    bucket count bounded by the value range — never a sort."""
    ev = read_table(spark, sf_dir, "events")
    return ev.groupBy(
        "event_type", F.floor(F.col("value") / 50.0).cast("long").alias("bucket")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.min("value"), 4).alias("lo"),
        F.round(F.max("value"), 4).alias("hi"),
    )


@register(
    "events_value_percentiles",
    oracle="""
    SELECT event_type,
           round(quantile_cont(value, 0.5), 6) AS p50,
           round(quantile_cont(value, 0.9), 6) AS p90,
           round(quantile_cont(value, 0.99), 6) AS p99
    FROM events GROUP BY event_type
    """,
)
def q_events_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latency-style percentile summary (p50/p90/p99) per event type:
    ONE exact-percentile aggregate evaluating all three fractions from
    a single buffer (linear interpolation — matches numpy and DuckDB
    quantile_cont bit-for-bit after rounding). The approx_percentile
    twin is the 100 TB switch, same as percentile_band_filter."""
    ev = read_table(spark, sf_dir, "events")
    band = F.percentile("value", F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99)))
    return ev.groupBy("event_type").agg(
        F.round(F.element_at(band, 1), 6).alias("p50"),
        F.round(F.element_at(band, 2), 6).alias("p90"),
        F.round(F.element_at(band, 3), 6).alias("p99"),
    )


@register(
    "events_dedup",
    oracle="""
    SELECT event_id, user_id, ts, event_type, value FROM (
      SELECT event_id, user_id, ts, event_type, value,
             row_number() OVER (PARTITION BY user_id, ts, event_type
                                ORDER BY event_id) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def q_events_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-once ingest sanity: drop replayed events on the natural
    key (user, ts, type), keeping the smallest event_id — min_by
    map-side election, the batch twin of the streaming
    dropDuplicatesWithinWatermark path (stream_dedup)."""
    ev = read_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type", "value"
    )
    surv = ev.groupBy("user_id", "ts", "event_type").agg(
        F.min_by(F.struct("event_id", "value"), F.col("event_id")).alias("__r")
    )
    return surv.select(
        F.col("__r.event_id").alias("event_id"),
        "user_id",
        "ts",
        "event_type",
        F.col("__r.value").alias("value"),
    )
