"""Registry batch 14 — CUBE/grouping-sets OLAP, edit-distance-verified
fuzzy dedup, and incremental rollup maintenance."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datas_spark.io.sources import read_table
from datas_spark.operators import incremental as INC
from datas_spark.registry_core import register
from datas_spark.registry10 import _simhash_near_dup_oracle

# ---------------------------------------------------------------------------
# OLAP CUBE (grouping sets with grouping flags)
# ---------------------------------------------------------------------------

@register(
    "events_cube",
    oracle="""
    SELECT grouping(event_type)::INT AS g_type,
           grouping(ubucket)::INT AS g_bucket,
           event_type, ubucket,
           count(*)::BIGINT AS n_events,
           sum(CAST(value AS DECIMAL(14,4))) AS sum_value
    FROM (SELECT event_type, (user_id % 10)::BIGINT AS ubucket, value
          FROM events)
    GROUP BY CUBE (event_type, ubucket)
    """,
)
def q_events_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full CUBE over (event_type, user bucket): all four grouping-set
    combinations in ONE pass (Catalyst expands the sets and shares the
    scan; the shuffle key space is the union of the set keys —
    4 * |groups| rows, not 4 scans). ``grouping()`` flags disambiguate
    aggregate NULLs from data NULLs; DECIMAL sums keep every
    total exact and order-free."""
    ev = read_table(spark, sf_dir, "events").select(
        "event_type",
        (F.col("user_id") % 10).cast("long").alias("ubucket"),
        F.col("value").cast("decimal(14,4)").alias("v"),
    )
    return (
        ev.cube("event_type", "ubucket")
        .agg(
            F.grouping("event_type").cast("int").alias("g_type"),
            F.grouping("ubucket").cast("int").alias("g_bucket"),
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum("v").alias("sum_value"),
        )
        .select(
            "g_type", "g_bucket", "event_type", "ubucket", "n_events", "sum_value"
        )
    )


# ---------------------------------------------------------------------------
# fuzzy dedup: banded SimHash candidates + edit-distance verification
# ---------------------------------------------------------------------------

_FUZZY_PREFIX = 256
_FUZZY_MAX_EDIT = 96


@register(
    "simhash_fuzzy_verified",
    oracle=f"""
    WITH pairs AS ({_simhash_near_dup_oracle()}),
    v AS (
      SELECT p.id_a, p.id_b, p.hamming,
             levenshtein(substr(da.text, 1, {_FUZZY_PREFIX}),
                         substr(db.text, 1, {_FUZZY_PREFIX}))::INT AS edit_dist
      FROM pairs p
      JOIN documents da ON da.doc_id = p.id_a
      JOIN documents db ON db.doc_id = p.id_b
    )
    SELECT * FROM v WHERE edit_dist <= {_FUZZY_MAX_EDIT}
    """,
)
def q_simhash_fuzzy_verified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The two-stage fuzzy-dedup pipeline: cheap banded SimHash
    candidate generation (complete recall for hamming <= 3), then an
    exact edit-distance verification on a bounded text prefix — the
    structure every production fuzzy matcher uses (candidates scale
    with bucket occupancy; the O(len^2) Levenshtein runs only on the
    few candidate pairs, never all pairs, and the prefix cap bounds its
    cost per pair)."""
    from datas_spark.operators import dedup as D

    docs = read_table(spark, sf_dir, "documents")
    pairs = D.simhash_near_dup_pairs(
        docs, "doc_id", "text", bits=60, bands=4, max_hamming=3
    )
    ta = docs.select(
        F.col("doc_id").alias("id_a"),
        F.substring("text", 1, _FUZZY_PREFIX).alias("__ta"),
    )
    tb = docs.select(
        F.col("doc_id").alias("id_b"),
        F.substring("text", 1, _FUZZY_PREFIX).alias("__tb"),
    )
    return (
        pairs.join(ta, "id_a")
        .join(tb, "id_b")
        .select(
            "id_a",
            "id_b",
            "hamming",
            F.levenshtein("__ta", "__tb").cast("int").alias("edit_dist"),
        )
        .where(F.col("edit_dist") <= _FUZZY_MAX_EDIT)
    )


# ---------------------------------------------------------------------------
# incremental rollup maintenance
# ---------------------------------------------------------------------------

_ROLLUP_SPLIT = "2024-03-01"


@register(
    "incremental_daily_rollup",
    oracle="""
    SELECT date_trunc('day', ts)::DATE::VARCHAR AS day, event_type,
           count(*)::BIGINT AS cnt,
           sum(CAST(value AS DECIMAL(20,4))) AS sum_val,
           min(CAST(value AS DECIMAL(20,4))) AS min_val,
           max(CAST(value AS DECIMAL(20,4))) AS max_val,
           round((sum(CAST(value AS DECIMAL(20,4))) / count(*))::DOUBLE, 6)
             AS avg_val
    FROM events GROUP BY 1, 2
    """,
)
def q_incremental_daily_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental rollup maintenance: the (day, event_type) rollup is
    built as history-partial ⊕ delta-partial (split at a cutoff date)
    and must be BIT-IDENTICAL to the full recompute — which is exactly
    what the oracle computes. DECIMAL partials make merge order
    irrelevant; this is the property that keeps incremental pipelines
    from drifting off their backfills."""
    ev = read_table(spark, sf_dir, "events").select(
        F.to_date("ts").cast("string").alias("day"), "event_type", "value", "ts"
    )
    hist = ev.where(F.col("ts") < F.lit(_ROLLUP_SPLIT).cast("timestamp_ntz"))
    delta = ev.where(F.col("ts") >= F.lit(_ROLLUP_SPLIT).cast("timestamp_ntz"))
    keys = ["day", "event_type"]
    merged = INC.merge_rollups(
        INC.partial_rollup(hist, keys, "value"),
        INC.partial_rollup(delta, keys, "value"),
        keys,
    )
    return INC.finalize_rollup(merged)
