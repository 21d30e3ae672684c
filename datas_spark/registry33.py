"""Registry batch 33 — embedding-cluster analytics without pairwise
joins: algebraic cohesion/separation and nearest-centroid label
agreement. Both run on exact-integer quantized vectors (1e-6 units),
so every cross-row sum is order-independent and the results are
bit-identical across engines and partitionings — the discipline that
makes vector analytics oracle-checkable at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from datas_spark.io.sources import read_table
from datas_spark.operators.clustering import (
    cluster_cohesion,
    nearest_centroid_accuracy,
)
from datas_spark.registry_core import register

_E_CTE = r"""
    WITH e AS (
      SELECT label, generate_subscripts(embedding, 1) AS d,
             round(unnest(embedding)::DOUBLE * 1000000)::BIGINT AS x
      FROM embeddings
    ), sums AS (
      SELECT label, d, sum(x)::BIGINT AS s FROM e GROUP BY 1, 2
    ), cnt AS (
      SELECT label, count(*)::BIGINT AS n_points FROM embeddings GROUP BY 1
    )
"""


@register(
    "cluster_cohesion",
    oracle=_E_CTE
    + """
    , ssq AS (
      SELECT label, sum(x * x)::DECIMAL(38,0) AS qq FROM e GROUP BY 1
    ), nrm AS (
      SELECT label, sum(s * s)::DECIMAL(38,0) AS nn FROM sums GROUP BY 1
    ), g AS (
      SELECT d, sum(s)::BIGINT AS gd FROM sums GROUP BY 1
    ), cx AS (
      SELECT label,
             sum(s::DECIMAL(38,0) * gd::DECIMAL(38,0))::DECIMAL(38,0) AS sg
      FROM sums JOIN g USING (d) GROUP BY 1
    ), tot AS (
      SELECT count(*)::BIGINT AS ntot FROM embeddings
    )
    SELECT c.label, c.n_points,
           CASE WHEN c.n_points > 1 THEN
             round((nrm.nn::DOUBLE - ssq.qq::DOUBLE)
                   / (c.n_points * (c.n_points - 1)) / 1e12, 6)
           END AS mean_pair_dot,
           round(sqrt(nrm.nn::DOUBLE) / c.n_points / 1e6, 6) AS centroid_norm,
           round(cx.sg::DOUBLE / (c.n_points * t.ntot) / 1e12, 6)
             AS centroid_dot_global
    FROM cnt c
    JOIN ssq USING (label) JOIN nrm USING (label) JOIN cx USING (label)
    CROSS JOIN tot t
    """,
)
def q_cluster_cohesion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-cluster mean pairwise dot product via the identity
    Σ_{i≠j} vᵢ·vⱼ = ||Σv||² − Σ||v||² — O(n) combinable aggregates
    where the naive formulation is an O(n²) self-join. Plus centroid
    norm and centroid·global-centroid separation. The cluster-quality
    triple every embedding-dedup/KMeans pipeline reads before trusting
    its clusters."""
    emb = read_table(spark, sf_dir, "embeddings")
    return cluster_cohesion(emb, "label", "embedding")


@register(
    "nearest_centroid_labels",
    oracle=_E_CTE
    + """
    , cent AS (
      SELECT s.label AS clabel,
             list(s.s::DOUBLE / c.n_points ORDER BY s.d) AS cvec
      FROM sums s JOIN cnt c USING (label)
      GROUP BY s.label, c.n_points
    ), pts AS (
      SELECT vec_id, label,
             list_transform(embedding,
                            v -> round(v::DOUBLE * 1000000)::BIGINT) AS q
      FROM embeddings
    ), scored AS (
      SELECT p.vec_id, p.label, c.clabel,
             list_sum(list_transform(range(1, len(p.q) + 1),
                      i -> p.q[i]::DOUBLE * c.cvec[i])) AS dot
      FROM pts p CROSS JOIN cent c
    ), best AS (
      SELECT vec_id, label, clabel,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY dot DESC, clabel ASC) AS r
      FROM scored
    )
    SELECT label, count(*)::BIGINT AS n_points,
           count(CASE WHEN label = clabel THEN 1 END)::BIGINT AS n_own,
           round(count(CASE WHEN label = clabel THEN 1 END)::DOUBLE
                 / count(*) * 100, 6) AS own_centroid_pct
    FROM best WHERE r = 1 GROUP BY label
    """,
)
def q_nearest_centroid_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-noise screen: per label, how many points sit closest (by
    dot product) to their OWN label centroid. Centroids come from the
    exact-integer sums; assignment is a map-side fold over one packed
    broadcast centroid array — the scoring scan never shuffles, so the
    pass costs one read of the vectors regardless of cluster count."""
    emb = read_table(spark, sf_dir, "embeddings")
    return nearest_centroid_accuracy(emb, "label", "embedding")
