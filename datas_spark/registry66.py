"""Registry batch 66 — merging diagnostics and DARE: per-layer task-
vector cosine (the interference report) and drop-and-rescale
sparsified merging (public method, md5-deterministic mask).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datas_spark.io.sources import read_table
from datas_spark.operators import taskvector as TV
from datas_spark.registry2 import _ckpt_f, _ckpt_p
from datas_spark.registry_core import register

_DARE_P = 0.9


@register(
    "task_vector_cosine",
    oracle="""
    WITH j AS (
      SELECT p_brand AS key,
             round(p_retailprice * 100)::BIGINT AS a,
             round(p_size::DOUBLE * 100)::BIGINT AS b
      FROM part
    ), g AS (
      SELECT key, count(*)::BIGINT AS n,
             sum(a * b)::BIGINT AS dot,
             sum(a * a)::BIGINT AS na, sum(b * b)::BIGINT AS nb
      FROM j GROUP BY key
    )
    SELECT key, n,
           round(CASE WHEN na > 0 AND nb > 0
                 THEN dot / (sqrt(na) * sqrt(nb)) END, 6) AS cos
    FROM g
    """,
)
def q_task_vector_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-layer cosine between the two synthetic checkpoints' vectors
    — the interference diagnostic run BEFORE choosing a merge method
    (anti-aligned layers are where naive averaging cancels skills and
    TIES/DARE earn their keep). Exact integer-cents moments."""
    return TV.tv_cosine_by_key(_ckpt_f(spark, sf_dir), _ckpt_p(spark, sf_dir))


@register(
    "dare_merge_apply",
    oracle=f"""
    WITH tv AS (
      SELECT p_brand AS key, p_partkey AS idx,
             p_retailprice - p_size AS value
      FROM part
    ), kept AS (
      SELECT key, idx, value / {1.0 - _DARE_P} AS value
      FROM tv
      WHERE ('0x' || substr(md5('dare:' || key || ':' || idx::VARCHAR), 1, 8))
              ::BIGINT / 4294967296.0 >= {_DARE_P}
    )
    SELECT p.p_brand AS key, p.p_partkey AS idx,
           round(p.p_size + coalesce(k.value, 0), 6) AS value
    FROM part p LEFT JOIN kept k
      ON k.key = p.p_brand AND k.idx = p.p_partkey
    """,
)
def q_dare_merge_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DARE merging end-to-end: drop {_DARE_P:.0%} of the task vector
    by the md5 mask, rescale survivors ×{1 / (1 - _DARE_P):.0f}, apply
    to the pretrained checkpoint — absent rows are zeros (sparse
    long-table convention), so the apply is a left join + coalesce.
    The drop protocol replays verbatim in the oracle."""
    tv = TV.task_vector(_ckpt_f(spark, sf_dir), _ckpt_p(spark, sf_dir))
    sparse = TV.dare_drop_rescale(tv, p=_DARE_P, seed="dare")
    pre = _ckpt_p(spark, sf_dir)
    joined = pre.join(
        sparse.select("key", "idx", F.col("value").alias("__tv")),
        ["key", "idx"],
        "left",
    )
    return joined.select(
        "key",
        "idx",
        F.round(F.col("value") + F.coalesce("__tv", F.lit(0.0)), 6).alias("value"),
    )
