"""Registry batch 35 — the generic salted equi-join, proven by an
IDENTITY oracle: the salted plan must produce byte-for-byte the same
rows as the plain join it replaces (salting buys distribution, never
semantics). The registered query enriches every event with its user's
lifetime stats — the classic hot-user fact-to-dim join that stragglers
kill at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datas_spark.io.sources import read_table
from datas_spark.operators.joins import salted_equi_join
from datas_spark.registry_core import register


@register(
    "events_salted_enrich",
    oracle="""
    WITH stats AS (
      SELECT user_id, count(*)::BIGINT AS user_events,
             min(ts) AS first_seen
      FROM events GROUP BY 1
    )
    SELECT e.event_id, e.user_id, e.event_type, s.user_events, s.first_seen
    FROM events e JOIN stats s USING (user_id)
    """,
)
def q_events_salted_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-to-dim enrichment through `salted_equi_join`: every event
    picks up its user's lifetime event count and first-seen time. The
    oracle is the PLAIN join — the identity contract is the whole
    point (same output, skew-proof distribution: a user holding 30% of
    events probes across 8 tasks instead of one).

    The dim side here derives from the fact table (a per-user
    aggregate), so the query also exercises the common self-enrichment
    topology where the dim is too big to broadcast at 10⁹ users."""
    ev = read_table(spark, sf_dir, "events")
    stats = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("user_events"),
        F.min("ts").alias("first_seen"),
    )
    left = ev.select("event_id", "user_id", "event_type")
    return salted_equi_join(left, stats, "user_id", salt_buckets=8)
