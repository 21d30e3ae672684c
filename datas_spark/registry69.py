"""Registry batch 69 — k-core decomposition of the embedding near-dup
graph (graph-quality cut: core members are clustered duplicates,
peeled nodes are dangling single-edge matches).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from datas_spark.operators import dedup as D
from datas_spark.registry_core import register

_KC_K = 2
_KC_ROUNDS = 24  # unrolled peel rounds in the oracle: sf0.1's longest chain cascade is 15; margin above it


def _k_core_oracle() -> str:
    rounds = []
    prev = "e0"
    for r in range(1, _KC_ROUNDS + 1):
        rounds.append(f"""
    d{r} AS (
      SELECT n, count(*) AS d FROM (
        SELECT a AS n FROM {prev} UNION ALL SELECT b FROM {prev}
      ) GROUP BY n
    ), k{r} AS (SELECT n FROM d{r} WHERE d >= {_KC_K}
    ), e{r} AS MATERIALIZED (
      SELECT * FROM {prev}
      WHERE a IN (SELECT n FROM k{r}) AND b IN (SELECT n FROM k{r})
    )""")
        prev = f"e{r}"
    return f"""
    WITH p AS MATERIALIZED (
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
      ) WHERE cos >= 0.3
    ), e0 AS MATERIALIZED (
      SELECT DISTINCT id_a AS a, id_b AS b FROM p WHERE id_a != id_b
    ),{",".join(rounds)}
    SELECT node, count(*)::BIGINT AS degree FROM (
      SELECT a AS node FROM {prev} UNION ALL SELECT b FROM {prev}
    ) GROUP BY node HAVING count(*) >= {_KC_K}
    """


@register("embedding_kcore", oracle=_k_core_oracle())
def q_embedding_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{_KC_K}-core of the embedding cosine near-dup graph (t=0.3,
    label-blocked, Arrow-matmul pair backend): iterative degree peeling with per-round
    localCheckpoints; the oracle unrolls {_KC_ROUNDS} materialized peel rounds (sf0.1 converges in 15; extra rounds are fixpoints)."""
    from datas_spark.operators import artifacts as ART

    pairs = ART.pairs_artifact(spark, sf_dir, "embcos")
    return D.k_core(pairs, k=_KC_K)
