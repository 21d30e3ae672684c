"""Registry batch 76 — incremental component maintenance: old corpus
assignments + a new batch's pairs merged WITHOUT replaying old-pair
history; the oracle recomputes components over the FULL pair set, so
the merge path must land on identical labels.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datas_spark.io.sources import read_table
from datas_spark.operators import dedup as D
from datas_spark.registry_core import register

_INC_CUT = 250  # doc_id < cut = the "already ingested" corpus


@register(
    "incremental_components",
    oracle=r"""
    WITH RECURSIVE sh AS (
      SELECT doc_id,
        list_distinct(list_transform(
          range(1, greatest(len(string_split_regex(trim(text), '\s+')) - 2, 0) + 1),
          i -> array_to_string((string_split_regex(trim(text), '\s+'))[i:i+2], ' ')))
          AS grams
      FROM documents
    ), ex AS (
      SELECT doc_id, len(grams) AS n, unnest(grams) AS s FROM sh
    ), pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.n AS na, b.n AS nb,
             count(*) AS shared
      FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2, 3, 4
      HAVING shared / (na + nb - shared) >= 0.2
    ), e AS (
      SELECT id_a AS a, id_b AS b FROM pairs
      UNION SELECT id_b, id_a FROM pairs
    ), reach(node, r) AS (
      SELECT a, a FROM e
      UNION
      SELECT e.a, reach.r FROM e JOIN reach ON reach.node = e.b
    ), comp AS (
      SELECT node, min(r) AS component FROM reach GROUP BY node
    )
    SELECT d.doc_id AS node,
           coalesce(comp.component, d.doc_id) AS component
    FROM documents d LEFT JOIN comp ON d.doc_id = comp.node
    """,
)
def q_incremental_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The incremental-ingest path: the first {_INC_CUT} docs' components
    are 'already persisted' (computed from old-corpus pairs only); the
    new batch contributes ONLY pairs touching a new doc. The merge
    folds label edges + new pairs — and must hash-match the oracle's
    full recompute over ALL pairs, proving the maintenance identity."""
    from datas_spark.operators import artifacts as ART

    docs = read_table(spark, sf_dir, "documents")
    # Two branches (old_pairs/new_pairs) consume this frame; reading
    # the materialize-once pairs artifact means the shingle inverted
    # index (the most expensive stage) never recomputes here at all —
    # both branches are pruned parquet scans.
    pairs = ART.pairs_artifact(spark, sf_dir, "jaccard")
    old_pairs = pairs.where(
        (F.col("id_a") < _INC_CUT) & (F.col("id_b") < _INC_CUT)
    )
    new_pairs = pairs.where(
        (F.col("id_a") >= _INC_CUT) | (F.col("id_b") >= _INC_CUT)
    )
    old_docs = docs.where(F.col("doc_id") < _INC_CUT).select("doc_id")
    stored = D.near_dedup_keep_first(old_docs, "doc_id", old_pairs).select(
        F.col("doc_id").alias("node"), "component"
    )
    merged = D.merge_components(stored, new_pairs)
    # new docs with no pairs at all still need a row
    all_docs = docs.select(F.col("doc_id").alias("node"))
    return (
        all_docs.join(merged, "node", "left")
        .select("node", F.coalesce("component", F.col("node")).alias("component"))
    )
