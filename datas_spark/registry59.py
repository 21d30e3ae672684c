"""Registry batch 59 — evaluation metrics: temporal repeat-view
recommendation eval (MRR / recall@k, exact-integer averaging), binary
AUC by tie-corrected rank-sum, and Cohen's kappa for the declared-vs-
detected language labels (`operators/evalmetrics.py`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from datas_spark.functions import text as T
from datas_spark.io.sources import read_table
from datas_spark.operators import evalmetrics as EM
from datas_spark.registry_core import register
from datas_spark.registry34 import _LANG_ORACLE

_EVAL_CUT = "2024-01-16"
_EVAL_K = 5
_EVAL_SCALE = 60  # lcm(1..5)


@register(
    "repeat_view_eval",
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
      SELECT u, count(*) AS n_truth FROM truth GROUP BY u
    ), hits AS (
      SELECT p.u, min(p.r) AS best, count(*) AS hits_k
      FROM preds p JOIN truth t ON p.u = t.u AND p.i = t.i
      GROUP BY p.u
    ), per_user AS (
      SELECT nt.u,
             coalesce({_EVAL_SCALE} // best, 0) AS rr_s,
             ({_EVAL_SCALE} * coalesce(hits_k, 0))
               // least(n_truth, {_EVAL_K}) AS rec_s
      FROM nt LEFT JOIN hits ON nt.u = hits.u
    )
    SELECT count(*)::BIGINT AS n_users,
           round(sum(rr_s) / ({_EVAL_SCALE}.0 * count(*)), 6) AS mrr,
           round(sum(rec_s) / ({_EVAL_SCALE}.0 * count(*)), 6) AS recall_at_k
    FROM per_user
    """,
)
def q_repeat_view_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal recommendation eval: predict weeks-3+ views from each
    user's weeks-1-2 top-{_EVAL_K} most-viewed items (count desc, item
    asc tie-break); score with MRR and recall@{_EVAL_K} on the
    exact-integer path (scale {_EVAL_SCALE} = lcm(1..{_EVAL_K}) — the
    metric is bit-identical on any row order)."""
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
    w = Window.partitionBy("u").orderBy(F.desc("__c"), F.asc("i"))
    preds = (
        counts.withColumn("r", F.row_number().over(w))
        .where(F.col("r") <= _EVAL_K)
        .select("u", "i", "r")
    )
    truth = views.where(F.col("ts") >= _EVAL_CUT).select("u", "i")
    return EM.ranking_metrics(
        preds, truth, "u", "i", "r", k=_EVAL_K, exact_scale=_EVAL_SCALE
    )


@register(
    "purchase_value_auc",
    oracle="""
    WITH lab AS (
      SELECT round(value, 2) AS s,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
      FROM events WHERE event_type IN ('purchase', 'view') AND value IS NOT NULL
    ), g AS (
      SELECT s, count(*) FILTER (y = 1) AS pos, count(*) FILTER (y = 0) AS neg
      FROM lab GROUP BY s
    ), c AS (
      SELECT pos, neg,
             pos * (2 * coalesce(sum(neg) OVER (
               ORDER BY s ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               + neg) AS c2
      FROM g
    )
    SELECT sum(pos)::BIGINT AS n_pos, sum(neg)::BIGINT AS n_neg,
           round(sum(c2) / (2.0 * sum(pos) * sum(neg)), 6) AS auc
    FROM c
    """,
)
def q_purchase_value_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Does event value separate purchases from views? ROC AUC by the
    Mann–Whitney rank-sum with tie correction — exact ×2-scaled
    integer numerator, no pairwise join; the cumulative window runs
    over the distinct-score aggregate, not raw rows. precision=2
    ENFORCES the distinct-score bound (a continuous score would
    otherwise make |distinct| ≈ n); the oracle rounds identically."""
    ev = read_table(spark, sf_dir, "events")
    lab = ev.where(F.col("event_type").isin("purchase", "view")).select(
        "value", (F.col("event_type") == "purchase").cast("int").alias("y")
    )
    return EM.binary_auc(lab, "value", "y", precision=2)


@register(
    "lang_agreement_kappa",
    oracle="WITH guesses AS (" + _LANG_ORACLE + """
    ), pairs AS (
      SELECT d.lang AS a, g.lang_guess AS b
      FROM documents d JOIN guesses g USING (doc_id)
    ), tot AS (
      SELECT count(*)::BIGINT AS n,
             count(*) FILTER (a = b)::BIGINT AS agree
      FROM pairs
    ), marg AS (
      SELECT c, count(*) FILTER (ia = 1)::BIGINT AS na,
             count(*) FILTER (ia = 0)::BIGINT AS nb
      FROM (
        SELECT a AS c, 1 AS ia FROM pairs
        UNION ALL SELECT b, 0 FROM pairs
      ) GROUP BY c
    ), ch AS (SELECT sum(na * nb)::BIGINT AS chance2 FROM marg)
    SELECT n, round(agree / n::DOUBLE, 6) AS po,
           round(chance2 / (n::DOUBLE * n), 6) AS pe,
           round((agree / n::DOUBLE - chance2 / (n::DOUBLE * n))
                 / (1 - chance2 / (n::DOUBLE * n)), 6) AS kappa
    FROM tot CROSS JOIN ch
    """,
)
def q_lang_agreement_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between the corpus's declared language tags and
    the n-gram detector — the chance-corrected scalar on top of the
    `lang_id_confusion` matrix. Exact BIGINT counts, divisions at the
    end."""
    docs = read_table(spark, sf_dir, "documents")
    pairs = docs.select(
        F.col("lang").alias("a"), T.language_id("text").alias("b")
    )
    return EM.cohens_kappa(pairs, "a", "b")
