"""Registry batch 47 — governance and engagement rollups: PII density
per source (which feeds carry the release risk) and session bounce
statistics (the engagement headline from the sessionizer).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from datas_spark.functions.text import token_count
from datas_spark.io.sources import read_table
from datas_spark.operators import corpus as C
from datas_spark.fixtures import AUG_PII_SQL, EMAIL_RE, IP_RE, PHONE_RE, augment_pii
from datas_spark.registry_core import register


@register(
    "pii_density_by_source",
    oracle=rf"""
    WITH aug AS ({AUG_PII_SQL}),
    j AS (
      SELECT d.source, a.text
      FROM aug a JOIN documents d USING (doc_id)
    )
    SELECT source, count(*)::BIGINT AS n_docs,
           sum(len(list_filter(
             string_split_regex(trim(regexp_replace(lower(text),
               '([^\w\s])', ' \1 ', 'g')), '\s+'), t -> t != '')))::BIGINT
             AS n_tokens,
           sum(len(regexp_extract_all(text, '{EMAIL_RE}')))::BIGINT AS n_email,
           sum(len(regexp_extract_all(text, '{PHONE_RE}')))::BIGINT AS n_phone,
           sum(len(regexp_extract_all(text, '{IP_RE}')))::BIGINT AS n_ip,
           round((sum(len(regexp_extract_all(text, '{EMAIL_RE}')))
                + sum(len(regexp_extract_all(text, '{PHONE_RE}')))
                + sum(len(regexp_extract_all(text, '{IP_RE}'))))::DOUBLE
                 / sum(len(list_filter(
                     string_split_regex(trim(regexp_replace(lower(text),
                       '([^\w\s])', ' \1 ', 'g')), '\s+'), t -> t != '')))
                 * 1000, 6) AS pii_per_1k_tokens
    FROM j GROUP BY source
    """,
)
def q_pii_density_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII density per source (with the same deterministic fake-PII
    augmentation as `pii_stats` — the synthetic corpus contains none):
    typed hit counts and hits-per-1k-tokens, the number a release
    review sorts feeds by. One map-side regex/token pass, one grouped
    aggregate; everything exact integers until the final density."""
    docs = read_table(spark, sf_dir, "documents")
    aug = augment_pii(docs)
    stats = C.pii_stats(aug, "doc_id", "text").select(
        "doc_id", "n_email", "n_phone", "n_ip", token_count("text").alias("__tok")
    )
    j = stats.join(docs.select("doc_id", "source"), "doc_id")
    hits = F.sum("n_email") + F.sum("n_phone") + F.sum("n_ip")
    return j.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("__tok").cast("long").alias("n_tokens"),
        F.sum("n_email").cast("long").alias("n_email"),
        F.sum("n_phone").cast("long").alias("n_phone"),
        F.sum("n_ip").cast("long").alias("n_ip"),
        F.round(
            hits.cast("double") / F.sum("__tok").cast("double") * 1000, 6
        ).alias("pii_per_1k_tokens"),
    )


@register(
    "session_bounce_stats",
    oracle="""
    WITH o AS (
      SELECT user_id, ts, event_id,
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
    ), per_session AS (
      SELECT user_id, sid, count(*)::BIGINT AS n_events,
             epoch_us(max(ts)) - epoch_us(min(ts)) AS dur_us
      FROM sess GROUP BY 1, 2
    )
    SELECT count(*)::BIGINT AS n_sessions,
           count(CASE WHEN n_events = 1 THEN 1 END)::BIGINT AS bounce_sessions,
           round(count(CASE WHEN n_events = 1 THEN 1 END)::DOUBLE
                 / count(*) * 100, 6) AS bounce_rate_pct,
           round(sum(dur_us)::DOUBLE / count(*) / 1e6, 6) AS avg_duration_s,
           round(sum(n_events)::DOUBLE / count(*), 6) AS avg_events
    FROM per_session
    """,
)
def q_session_bounce_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engagement headline from the sessionizer: bounce rate
    (single-event sessions), average session duration, and average
    events per session, over 5-minute-gap sessions. Same lag/cumsum
    session construction as `events_sessionize` (one user_id shuffle,
    both windows share the sort); durations are exact integer
    microseconds; the final report is one tiny aggregate."""
    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.when(
            F.lag("ts").over(w).isNull()
            | (
                F.col("ts").cast("timestamp").cast("double")
                - F.lag(F.col("ts").cast("timestamp").cast("double")).over(w)
                >= 300.0
            ),
            1,
        )
        .otherwise(0)
        .alias("new_s"),
    )
    sess = marked.withColumn(
        "sid",
        F.sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    per_session = sess.groupBy("user_id", "sid").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        (F.max(us) - F.min(us)).alias("dur_us"),
    )
    bounce = F.count(F.when(F.col("n_events") == 1, 1))
    return per_session.agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions"),
        bounce.cast("long").alias("bounce_sessions"),
        F.round(bounce.cast("double") / F.count(F.lit(1)) * 100, 6).alias(
            "bounce_rate_pct"
        ),
        F.round(
            F.sum("dur_us").cast("double") / F.count(F.lit(1)) / 1e6, 6
        ).alias("avg_duration_s"),
        F.round(
            F.sum("n_events").cast("double") / F.count(F.lit(1)), 6
        ).alias("avg_events"),
    )
