"""Registry batch 13 — curation fate audit, event-sourced state views
(latest-wins upsert + SCD2 history), and embedding-space benchmark
decontamination."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datas_spark.io.sources import read_table
from datas_spark.operators import similarity as SIM
from datas_spark.registry_core import register
from datas_spark.registry2 import _planes_values_sql
from datas_spark.registry5 import _CURATE_CTES, _CURATE_FINAL_SQL

# ---------------------------------------------------------------------------
# curation fate audit
# ---------------------------------------------------------------------------

@register(
    "curate_audit",
    oracle=f"""{_CURATE_CTES}, kept AS (
      {_CURATE_FINAL_SQL.strip()}
    )
    SELECT d.doc_id,
      CASE WHEN rk.doc_id IS NULL THEN 'repetition_filtered'
           WHEN de.doc_id IS NULL THEN 'exact_duplicate'
           WHEN cl.doc_id IS NULL THEN 'contaminated'
           WHEN k.doc_id IS NULL THEN 'rebalanced_out'
           ELSE 'kept_' || k.split END AS status
    FROM documents d
    LEFT JOIN rep_keep rk USING (doc_id)
    LEFT JOIN ded de USING (doc_id)
    LEFT JOIN clean cl USING (doc_id)
    LEFT JOIN kept k USING (doc_id)
    """,
)
def q_curate_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document fate of the flagship curation recipe (same config
    as `curate_corpus`): which stage dropped each doc, or its kept
    split. The audit reads the recipe's OWN lazy stage frames
    (`curate_corpus(stage_ids=...)`), so it cannot drift from the real
    pipeline; the oracle re-wraps the recipe CTE chain with one left
    join per stage."""
    from datas_spark.pipeline.curate import curate_audit

    docs = read_table(spark, sf_dir, "documents")
    return curate_audit(
        docs,
        benchmark=docs.where("doc_id < 20"),
        domain_col="lang",
        max_dup_token_frac=0.9,
        max_top_bigram_frac=0.9,
        temperature=2.0,
        split_weights={"train": 0.9, "test": 0.1},
    )


# ---------------------------------------------------------------------------
# event-sourced state: latest-wins upsert view + SCD2 history
# ---------------------------------------------------------------------------

@register(
    "user_latest_event",
    oracle="""
    SELECT user_id, ts::VARCHAR AS last_ts,
           event_type AS last_event_type,
           round(value, 4) AS last_value
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def q_user_latest_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-wins upsert view of the event log (the merge-on-read
    CDC snapshot): one combinable ``max_by`` per user over the total
    order (ts, event_id) — no per-key window over raw events, so the
    shuffle carries one struct per user."""
    ev = read_table(spark, sf_dir, "events")
    ordk = F.struct(F.col("ts"), F.col("event_id"))
    return (
        ev.groupBy("user_id")
        .agg(
            F.max_by(
                F.struct(
                    F.col("ts").cast("string").alias("t"),
                    F.col("event_type").alias("et"),
                    F.col("value").alias("v"),
                ),
                ordk,
            ).alias("__last")
        )
        .select(
            "user_id",
            F.col("__last.t").alias("last_ts"),
            F.col("__last.et").alias("last_event_type"),
            F.round(F.col("__last.v"), 4).alias("last_value"),
        )
    )


@register(
    "user_event_history",
    oracle="""
    SELECT user_id, event_id, event_type,
           ts::VARCHAR AS valid_from,
           (lead(ts) OVER w)::VARCHAR AS valid_to,
           (CASE WHEN lead(ts) OVER w IS NULL THEN 1 ELSE 0 END)::INT
             AS is_current
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
    """,
)
def q_user_event_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 history reconstruction from the event log: each state row
    carries [valid_from, valid_to) with the successor's timestamp as
    its expiry (NULL = current). The window partitions on user_id —
    per-key local sort, scale-safe (never a global window)."""
    from pyspark.sql import Window

    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    nxt = F.lead(F.col("ts").cast("string")).over(w)
    return ev.select(
        "user_id",
        "event_id",
        "event_type",
        F.col("ts").cast("string").alias("valid_from"),
        nxt.alias("valid_to"),
        F.when(nxt.isNull(), 1).otherwise(0).cast("int").alias("is_current"),
    )


# ---------------------------------------------------------------------------
# embedding-space benchmark decontamination
# ---------------------------------------------------------------------------

_XC_PLANES = 4
_XC_THRESHOLD = 0.3

_XC_COS_SQL = """
          list_sum(list_transform(range(1, len(t.embedding) + 1),
                   i -> t.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE))
          / (sqrt(list_sum(list_transform(range(1, len(t.embedding) + 1),
                   i -> t.embedding[i]::DOUBLE * t.embedding[i]::DOUBLE)))
           * sqrt(list_sum(list_transform(range(1, len(b.embedding) + 1),
                   i -> b.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE))))
"""


@register(
    "embedding_decontaminate",
    oracle=f"""
    WITH pl AS (SELECT * FROM {_planes_values_sql(_XC_PLANES)}),
    buckets AS (
      SELECT e.vec_id,
        sum(CASE WHEN list_sum(list_transform(range(1, len(e.embedding) + 1),
              i -> e.embedding[i]::DOUBLE * p.pv[i])) >= 0
            THEN (1::BIGINT << p.pid) ELSE 0 END)::BIGINT AS bucket
      FROM embeddings e CROSS JOIN pl p GROUP BY e.vec_id
    ), cand AS (
      SELECT t.vec_id, {_XC_COS_SQL} AS cos
      FROM buckets tb
      JOIN buckets bb ON tb.bucket = bb.bucket
      JOIN embeddings t ON t.vec_id = tb.vec_id
      JOIN embeddings b ON b.vec_id = bb.vec_id
      WHERE tb.vec_id % 13 != 0 AND bb.vec_id % 13 = 0
    )
    SELECT vec_id, count(*)::BIGINT AS n_matches,
           round(max(cos), 6) AS max_cos
    FROM cand WHERE cos >= {_XC_THRESHOLD} GROUP BY vec_id
    """,
)
def q_embedding_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic (embedding-space) benchmark decontamination: training
    vectors too close to any benchmark vector, found through the
    hyperplane-bucket equi-join — the embedding twin of the n-gram
    `bloom_decontaminate` probe. Benchmark slice = vec_id % 13 = 0."""
    emb = read_table(spark, sf_dir, "embeddings")
    return SIM.cross_contamination(
        emb.where("vec_id % 13 != 0"),
        emb.where("vec_id % 13 = 0"),
        "vec_id",
        "embedding",
        threshold=_XC_THRESHOLD,
        n_planes=_XC_PLANES,
    )
