"""Registry batch 22 — training-set construction primitives:
contrastive hard-negative mining, exact deterministic label
rebalancing, and per-source score calibration by rank normalization.

Determinism discipline: hard negatives rank a 6-dp-rounded cosine with
id tie-breaks; rebalancing replicates by exact integer factors with the
md5-uniform election; calibration is percent_rank over a 6-dp-rounded
score — every cross-engine comparison happens on exact values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from datas_spark.functions import text as T
from datas_spark.io.sources import read_table
from datas_spark.operators import corpus as C
from datas_spark.operators import similarity as SIM
from datas_spark.registry_core import register

_HN_QUERIES = 3  # vec_id < 3 are the anchor set
_HN_K = 5

# md5-uniform (same expression family as registry5's _MD5_UNIT_SQL)
_MD5_SQL = "(('0x' || substr(md5({key}), 1, 8))::BIGINT / 4294967296.0)"


@register(
    "hard_negative_mining",
    oracle=f"""
    WITH q AS (
      SELECT vec_id AS q_vec_id, embedding AS qv, label AS ql
      FROM embeddings WHERE vec_id < {_HN_QUERIES}
    ), scored AS (
      SELECT q.q_vec_id, d.vec_id AS d_vec_id,
        round(
          list_sum(list_transform(range(1, len(d.embedding) + 1),
                   i -> d.embedding[i]::DOUBLE * q.qv[i]::DOUBLE))
          / (sqrt(list_sum(list_transform(range(1, len(d.embedding) + 1),
                   i -> d.embedding[i]::DOUBLE * d.embedding[i]::DOUBLE)))
           * sqrt(list_sum(list_transform(range(1, len(q.qv) + 1),
                   i -> q.qv[i]::DOUBLE * q.qv[i]::DOUBLE)))), 6) AS cos
      FROM embeddings d CROSS JOIN q
      WHERE d.label != q.ql
    )
    SELECT q_vec_id, d_vec_id, cos, rank FROM (
      SELECT *, row_number() OVER (PARTITION BY q_vec_id
                                   ORDER BY cos DESC, d_vec_id ASC) AS rank
      FROM scored
    ) WHERE rank <= {_HN_K}
    """,
)
def q_hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive hard negatives: for each anchor embedding, the top-5
    most similar vectors with a DIFFERENT label — the highest-loss
    negatives for contrastive/embedding training (the easy negatives a
    random sampler drew teach nothing).

    Same scale-safe plan as ``cosine_topk`` (broadcast anchor set,
    map-side cosine, two-stage bucketed rank — no per-query hot
    reducer); the label-mismatch restriction filters candidate pairs
    before anything ranks."""
    emb = read_table(spark, sf_dir, "embeddings")
    return SIM.cosine_topk(
        emb,
        emb.where(F.col("vec_id") < _HN_QUERIES),
        "vec_id",
        "vec_id",
        "embedding",
        k=_HN_K,
        exclude_match_col="label",
    )


@register(
    "label_rebalance",
    oracle=f"""
    WITH counts AS (
      SELECT label AS lbl, count(*)::BIGINT AS c FROM embeddings GROUP BY label
    ), tgt AS (
      SELECT max(c)::BIGINT AS t FROM counts
    ), ranked AS (
      SELECT e.vec_id, e.label, c.c, g.t,
             row_number() OVER (PARTITION BY e.label
                                ORDER BY {_MD5_SQL.format(key="e.vec_id::VARCHAR")} ASC,
                                         e.vec_id ASC) AS rk
      FROM embeddings e JOIN counts c ON c.lbl = e.label CROSS JOIN tgt g
    )
    SELECT vec_id, label,
           unnest(range(1, (t // c) + (CASE WHEN rk <= t % c THEN 1 ELSE 0 END) + 1))
             AS copy_idx
    FROM ranked
    """,
)
def q_label_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact class rebalancing of the embedding labels to the majority
    class count: minority rows replicate ``t div c`` times, with the
    ``t mod c`` smallest-md5-draw rows of each class carrying one extra
    copy — every class ends at exactly ``t`` rows, bit-reproducibly on
    any cluster layout (see ``corpus.rebalance_labels``)."""
    emb = read_table(spark, sf_dir, "embeddings").select("vec_id", "label")
    return C.rebalance_labels(emb, "vec_id", "label")


@register(
    "source_calibrated_quality",
    oracle=r"""
    WITH t AS (
      SELECT doc_id, source, text,
        string_split_regex(trim(text), '\s+') AS toks,
        length(text) AS n,
        length(text) - length(regexp_replace(text, '[^\w\s]', '', 'g')) AS n_punct
      FROM documents
    ), terms AS (
      SELECT doc_id, source,
        least(n / 500.0, 1.0) AS len_term,
        least((CASE WHEN len(toks) > 0
               THEN len(list_filter(toks, t -> lower(t) IN
                    ('the','and','of','to','a','in','is','it')))::DOUBLE / len(toks)
               ELSE 0.0 END) * 4.0, 1.0) AS stop_term,
        1.0 - least((CASE WHEN n > 0 THEN n_punct::DOUBLE / n ELSE 0.0 END) * 5.0, 1.0)
          AS punct_term
      FROM t
    ), scored AS (
      SELECT doc_id, source,
             round((len_term + stop_term + punct_term) / 3.0, 6) AS quality
      FROM terms
    )
    SELECT doc_id, source, quality,
           round(percent_rank() OVER (PARTITION BY source
                                      ORDER BY quality ASC), 6) AS calibrated
    FROM scored
    """,
)
def q_source_calibrated_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source score calibration: the heuristic quality score is
    rank-normalized WITHIN each source (percent_rank → [0, 1]), so a
    quality cutoff means "keep the best X% of every source" rather
    than letting one source's score scale dominate the mix — the
    standard correction when combining corpora whose raw scores are
    not comparable.

    Ties share a percent_rank in both engines (rank semantics), the
    score is rounded before ranking, and the window is PARTITIONED BY
    source — per-source local sorts, no global ordering."""
    docs = read_table(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id", "source", T.quality_score("text").alias("quality")
    )
    w = Window.partitionBy("source").orderBy(F.asc("quality"))
    return scored.select(
        "doc_id",
        "source",
        "quality",
        F.round(F.percent_rank().over(w), 6).alias("calibrated"),
    )
