"""Registry batch 36 — quality gating and privacy auditing: rule-based
quarantine routing (bad rows carry their violated rule names) and the
k-anonymity exposure report over quasi-identifiers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datas_spark.io.sources import read_table
from datas_spark.operators.validate import k_anonymity, quarantine
from datas_spark.registry_core import register


@register(
    "events_quarantine",
    oracle="""
    WITH tagged AS (
      SELECT event_id,
             list_sort(list_filter([
               CASE WHEN NOT coalesce(value >= 0, false)
                    THEN 'value_nonnegative' END,
               CASE WHEN NOT coalesce(user_id IS NOT NULL, false)
                    THEN 'user_present' END,
               CASE WHEN NOT coalesce(event_type IN
                      ('view','click','purchase','signup'), false)
                    THEN 'known_type' END
             ], x -> x IS NOT NULL)) AS failed_rules
      FROM events
    )
    SELECT event_id, failed_rules FROM tagged WHERE len(failed_rules) > 0
    """,
)
def q_events_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quarantine routing on the event stream: rows violating any of
    three content rules (non-negative value, user present, known event
    type) are diverted with the exact rule names they failed — the
    ingestion gate that keeps the pipeline running while defects land
    in an inspectable side table. One map-side expression derives both
    routes; this query returns the quarantined side ('error' rows are
    the planted defect class in the generator)."""
    ev = read_table(spark, sf_dir, "events")
    rules = {
        "value_nonnegative": F.col("value") >= 0,
        "user_present": F.col("user_id").isNotNull(),
        "known_type": F.col("event_type").isin("view", "click", "purchase", "signup"),
    }
    _good, bad = quarantine(ev, rules)
    return bad.select("event_id", "failed_rules")


@register(
    "customer_k_anonymity",
    oracle="""
    WITH g AS (
      SELECT c_nationkey, c_mktsegment, count(*)::BIGINT AS n
      FROM customer GROUP BY 1, 2
    )
    SELECT 5::BIGINT AS k_required,
           min(n)::BIGINT AS min_group_size,
           count(*)::BIGINT AS n_groups,
           sum(n)::BIGINT AS n_rows,
           sum(CASE WHEN n < 5 THEN n ELSE 0 END)::BIGINT AS rows_at_risk,
           round(sum(CASE WHEN n < 5 THEN n ELSE 0 END)::DOUBLE
                 / sum(n)::DOUBLE * 100, 6) AS at_risk_pct
    FROM g
    """,
)
def q_customer_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity exposure report over the customer table's
    quasi-identifiers (nation × market segment): rows whose
    quasi-identifier group has fewer than k=5 members are individually
    re-identifiable under linkage and would need generalizing or
    suppressing before a release — the privacy screen to run before
    any user-attributable slice ships into a corpus. One combinable
    grouped count + a tiny re-aggregate."""
    cust = read_table(spark, sf_dir, "customer")
    return k_anonymity(cust, ["c_nationkey", "c_mktsegment"], k=5)
