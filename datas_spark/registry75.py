"""Registry batch 75 — per-class PRF1, nDCG@k, and the reference's
active-learning round (select-from-unlabeled → promote) as one plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datas_spark.functions import text as T
from datas_spark.io.sources import read_table
from datas_spark.operators import evalmetrics as EM
from datas_spark.operators.scoring import hash_unit_interval
from datas_spark.operators.selection import least_confidence_sampling
from datas_spark.registry34 import _LANG_ORACLE
from datas_spark.registry59 import _EVAL_CUT, _EVAL_K
from datas_spark.registry_core import register

_AL_K = 25


@register(
    "lang_prf1",
    oracle="WITH guesses AS (" + _LANG_ORACLE + """
    ), pairs AS (
      SELECT d.lang AS t, g.lang_guess AS p
      FROM documents d JOIN guesses g USING (doc_id)
    ), per_true AS (
      SELECT t AS label, count(*)::BIGINT AS n_true,
             count(*) FILTER (p = t)::BIGINT AS tp_t
      FROM pairs GROUP BY 1
    ), per_pred AS (
      SELECT p AS label, count(*)::BIGINT AS n_pred,
             count(*) FILTER (p = t)::BIGINT AS tp_p
      FROM pairs GROUP BY 1
    ), j AS (
      SELECT coalesce(pt.label, pp.label) AS label,
             coalesce(tp_t, tp_p, 0)::BIGINT AS tp,
             (coalesce(n_pred, 0) - coalesce(tp_p, 0))::BIGINT AS fp,
             (coalesce(n_true, 0) - coalesce(tp_t, 0))::BIGINT AS fn
      FROM per_true pt FULL OUTER JOIN per_pred pp ON pt.label = pp.label
    )
    SELECT label, tp, fp, fn,
           round(CASE WHEN tp + fp > 0 THEN tp / (tp + fp)::DOUBLE END, 6)
             AS precision,
           round(CASE WHEN tp + fn > 0 THEN tp / (tp + fn)::DOUBLE END, 6)
             AS recall,
           round(CASE WHEN 2 * tp + fp + fn > 0
                 THEN 2 * tp / (2 * tp + fp + fn)::DOUBLE END, 6) AS f1
    FROM j
    """,
)
def q_lang_prf1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-class precision/recall/F1 of the language detector against
    the declared tags — the class-level table under the kappa scalar
    and confusion matrix. Exact integer tp/fp/fn."""
    docs = read_table(spark, sf_dir, "documents")
    pairs = docs.select(
        F.col("lang").alias("t"), T.language_id("text").alias("p")
    )
    return EM.classification_prf1(pairs, "t", "p")


@register(
    "repeat_view_ndcg",
    oracle=f"""
    WITH views AS (
      SELECT user_id AS u, json_extract(props, '$.k')::INT AS i, ts
      FROM events WHERE event_type = 'view'
    ), preds AS (
      SELECT u, i, r FROM (
        SELECT u, i, row_number() OVER (
                 PARTITION BY u ORDER BY count(*) DESC, i ASC) AS r
        FROM views WHERE ts < TIMESTAMP '{_EVAL_CUT}' GROUP BY u, i
      ) WHERE r <= {_EVAL_K}
    ), truth AS (
      SELECT DISTINCT u, i FROM views WHERE ts >= TIMESTAMP '{_EVAL_CUT}'
    ), nt AS (
      SELECT u, count(*)::BIGINT AS n_truth FROM truth GROUP BY u
    ), hits AS (
      SELECT p.u, list_sort(list(p.r)) AS ranks
      FROM preds p JOIN truth t ON p.u = t.u AND p.i = t.i
      GROUP BY p.u
    ), per AS (
      SELECT nt.u,
        round((
          list_reduce(list_prepend(0.0, list_transform(
            coalesce(hits.ranks, []), r -> 1.0 / log2(r + 1.0))), (a, b) -> a + b)
          /
          list_reduce(list_prepend(0.0, list_transform(
            range(1, least(nt.n_truth, {_EVAL_K}) + 1),
            r -> 1.0 / log2(r + 1.0))), (a, b) -> a + b)
        ) * 1000000000)::BIGINT AS ndcg_e9
      FROM nt LEFT JOIN hits ON nt.u = hits.u
    )
    SELECT count(*)::BIGINT AS n_users,
           round(sum(ndcg_e9) / 1e9 / count(*), 6) AS ndcg_at_k
    FROM per
    """,
)
def q_repeat_view_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nDCG@{_EVAL_K} for the temporal repeat-view recommender — the
    position-weighted companion to MRR/recall, with per-user scores
    folded in sorted-rank order and e9-quantized before the global
    average (bit-stable on any row order)."""
    ev = read_table(spark, sf_dir, "events")
    views = ev.where(F.col("event_type") == "view").select(
        F.col("user_id").alias("u"),
        F.get_json_object("props", "$.k").cast("int").alias("i"),
        "ts",
    )
    counts = (
        views.where(F.col("ts") < _EVAL_CUT)
        .groupBy("u", "i")
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("u").orderBy(F.desc("__c"), F.asc("i"))
    preds = (
        counts.withColumn("r", F.row_number().over(w))
        .where(F.col("r") <= _EVAL_K)
        .select("u", "i", "r")
    )
    truth = views.where(F.col("ts") >= _EVAL_CUT).select("u", "i")
    return EM.ndcg_at_k(preds, truth, "u", "i", "r", k=_EVAL_K)


@register(
    "active_learning_round",
    oracle=f"""
    WITH pools AS (
      SELECT doc_id,
        CASE WHEN doc_id % 10 = 0 THEN 'labeled' ELSE 'unlabeled' END AS pool,
        ('0x' || substr(md5('al:' || doc_id::VARCHAR), 1, 8))::BIGINT
          / 4294967296.0 AS conf
      FROM documents
    ), picked AS (
      SELECT doc_id FROM (
        SELECT doc_id, row_number() OVER (ORDER BY conf DESC, doc_id ASC) AS rn
        FROM pools WHERE pool = 'unlabeled'
      ) WHERE rn <= {_AL_K}
    )
    SELECT p.doc_id, p.pool AS pool_before,
           CASE WHEN pk.doc_id IS NOT NULL THEN 'labeled' ELSE p.pool END
             AS pool_after
    FROM pools p LEFT JOIN picked pk ON p.doc_id = pk.doc_id
    """,
)
def q_active_learning_round(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One active-learning round, end-to-end (main.py:37-52 rd_N
    semantics): from the unlabeled pool, the {_AL_K} most-uncertain
    docs (proxy uncertainty at the model boundary; TakeOrdered top-k,
    never a full sort) are promoted into the labeled pool — the
    select→train loop's data half as one auditable plan."""
    docs = read_table(spark, sf_dir, "documents")
    pools = docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 10 == 0, "labeled")
        .otherwise("unlabeled")
        .alias("pool"),
        hash_unit_interval(
            F.concat(F.lit("al:"), F.col("doc_id").cast("string"))
        ).alias("conf"),
    )
    unlabeled = pools.where(F.col("pool") == "unlabeled")
    picked = least_confidence_sampling(
        unlabeled, "conf", k=_AL_K, tiebreak="doc_id"
    ).select("doc_id", F.lit(1).alias("__sel"))
    return (
        pools.join(F.broadcast(picked), "doc_id", "left")
        .select(
            "doc_id",
            F.col("pool").alias("pool_before"),
            F.when(F.col("__sel").isNotNull(), "labeled")
            .otherwise(F.col("pool"))
            .alias("pool_after"),
        )
    )
