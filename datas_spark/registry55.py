"""Registry batch 55 — training-example constructors: sliding-window
next-event datasets and deterministic hash-drawn negative sampling
(`operators/training.py`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datas_spark.io.sources import read_table
from datas_spark.operators import training as T
from datas_spark.registry_core import register

_SEQ_LEN = 5
_NEG_K = 3
_NEG_OVER = 4


@register(
    "next_event_examples",
    oracle=f"""
    WITH seq AS (
      SELECT event_id, user_id, event_type,
             list(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN {_SEQ_LEN} PRECEDING AND 1 PRECEDING) AS hist
      FROM events
    )
    SELECT event_id, user_id,
           array_to_string(hist, ',') AS history,
           event_type AS label
    FROM seq WHERE len(hist) >= 1 AND event_id % 7 = 0
    """,
)
def q_next_event_examples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(user's previous {_SEQ_LEN} event types → next event type)
    training rows — the session-based next-action dataset. One
    user-keyed window with a row-bounded frame; the mod-7 slice bounds
    driver-compared output (the window still runs over all rows)."""
    ev = read_table(spark, sf_dir, "events")
    ex = T.next_event_examples(
        ev, "user_id", "ts", "event_type", seq_len=_SEQ_LEN, tiebreak_col="event_id"
    )
    return ex.where(F.col("event_id") % 7 == 0).select(
        "event_id",
        "user_id",
        F.concat_ws(",", "history").alias("history"),
        "label",
    )


@register(
    "negative_sample_views",
    oracle=f"""
    WITH pos AS (
      SELECT DISTINCT user_id AS u, json_extract(props, '$.k')::INT AS i
      FROM events WHERE event_type = 'view'
    ), items AS (
      SELECT i, row_number() OVER (ORDER BY i) - 1 AS idx
      FROM (SELECT DISTINCT i FROM pos)
    ), n AS (
      SELECT count(*)::BIGINT AS n_items FROM items
    ), cand AS (
      SELECT u, c,
             ('0x' || substr(md5(u::VARCHAR || ':' || c::VARCHAR), 1, 15))::BIGINT
               % n_items AS idx
      FROM (SELECT DISTINCT u FROM pos)
      CROSS JOIN range({_NEG_K * _NEG_OVER}) t(c)
      CROSS JOIN n
    ), drawn AS (
      SELECT u, i, min(c) AS c
      FROM cand JOIN items USING (idx) GROUP BY 1, 2
    ), neg AS (
      SELECT d.* FROM drawn d ANTI JOIN pos p ON d.u = p.u AND d.i = p.i
    )
    SELECT u AS user_id, i AS item, c AS slot FROM (
      SELECT *, row_number() OVER (PARTITION BY u ORDER BY c) AS r FROM neg
    ) WHERE r <= {_NEG_K}
    """,
)
def q_negative_sample_views(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Up to {_NEG_K} hash-drawn negative items per user over the view
    interactions — implicit-feedback negatives, bit-reproducible (the
    md5 draw protocol is replayed verbatim in the oracle)."""
    ev = read_table(spark, sf_dir, "events")
    inter = ev.where(F.col("event_type") == "view").select(
        "user_id",
        F.get_json_object("props", "$.k").cast("int").alias("item"),
    )
    return T.negative_sample(
        inter, "user_id", "item", k=_NEG_K, oversample=_NEG_OVER
    ).select("user_id", "item", "slot")
