"""Registry batch 62 — semantic (embedding-space) dedup composition:
cosine near-dup pairs → connected components → representative
election, as ONE lazy plan with the full chain replayed in a
recursive-CTE oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datas_spark.io.sources import read_table
from datas_spark.operators import dedup as D
from datas_spark.registry_core import register

_SEM_ORACLE = """
    WITH RECURSIVE p AS (
      SELECT id_a, id_b FROM (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
          round(
            list_sum(list_transform(range(1, len(a.embedding) + 1),
                     i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE))
            / (sqrt(list_sum(list_transform(range(1, len(a.embedding) + 1),
                     i -> a.embedding[i]::DOUBLE * a.embedding[i]::DOUBLE)))
             * sqrt(list_sum(list_transform(range(1, len(b.embedding) + 1),
                     i -> b.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE)))), 6)
            AS cos
        FROM embeddings a JOIN embeddings b
          ON a.label = b.label AND a.vec_id < b.vec_id
      ) WHERE cos >= 0.5
    ), e AS (
      SELECT id_a AS a, id_b AS b FROM p
      UNION SELECT id_b, id_a FROM p
    ), reach(node, r) AS (
      SELECT a, a FROM e
      UNION
      SELECT e.a, reach.r FROM e JOIN reach ON reach.node = e.b
    ), comp AS (
      SELECT node, min(r) AS component FROM reach GROUP BY node
    )
    SELECT em.vec_id,
           coalesce(comp.component, em.vec_id) AS component,
           CASE WHEN comp.component IS NULL OR comp.component = em.vec_id
                THEN 1 ELSE 0 END AS is_representative
    FROM embeddings em LEFT JOIN comp ON em.vec_id = comp.node
    """


@register("embedding_semantic_dedup", oracle=_SEM_ORACLE)
def q_embedding_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup end-to-end: label-blocked cosine
    pairs (t=0.5) → min-label connected components → keep-first
    representative election — the embedding-space counterpart of the
    n-gram `near_dedup_resolve` chain, in one lazy plan. The oracle
    replays pair generation, the component recursion, AND the election,
    so a wiring bug between stages hash-mismatches instead of hiding.

    Scale shape: the pairwise cosine is bounded by the blocking key
    (swap the LSH bucket for `label` when no natural key exists — same
    downstream plan); components iterate on the pair graph only."""
    emb = read_table(spark, sf_dir, "embeddings")
    pairs = D.embedding_near_dup_pairs_vectorized(
        emb, "vec_id", "embedding", "label", threshold=0.5
    )
    resolved = D.near_dedup_keep_first(emb.select("vec_id"), "vec_id", pairs)
    return resolved.select(
        "vec_id",
        "component",
        F.col("is_representative").cast("int").alias("is_representative"),
    )
