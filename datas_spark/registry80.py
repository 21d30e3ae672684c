"""Registry batch 80 — dedup savings estimate: the one-row business
case for running near-dup dedup (docs and bytes dropped if keep-first
were applied).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datas_spark.io.sources import read_table
from datas_spark.operators import artifacts as ART
from datas_spark.operators import dedup as D
from datas_spark.registry_core import register


@register(
    "dedup_savings_estimate",
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
    ), p AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.n AS na, b.n AS nb,
             count(*) AS shared
      FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2, 3, 4
      HAVING shared / (na + nb - shared) >= 0.2
    ), e AS (
      SELECT id_a AS a, id_b AS b FROM p
      UNION SELECT id_b, id_a FROM p
    ), reach(node, r) AS (
      SELECT a, a FROM e
      UNION
      SELECT e.a, reach.r FROM e JOIN reach ON reach.node = e.b
    ), comp AS (
      SELECT node, min(r) AS component FROM reach GROUP BY node
    ), assigned AS (
      SELECT d.doc_id, d.n_chars,
             coalesce(comp.component, d.doc_id) AS component
      FROM documents d LEFT JOIN comp ON d.doc_id = comp.node
    )
    SELECT count(*)::BIGINT AS n_docs,
           count(*) FILTER (doc_id != component)::BIGINT AS n_dropped,
           sum(n_chars)::BIGINT AS total_chars,
           sum(CASE WHEN doc_id != component THEN n_chars ELSE 0 END)::BIGINT
             AS chars_dropped,
           round(count(*) FILTER (doc_id != component) / count(*)::DOUBLE * 100, 4)
             AS doc_pct,
           round(sum(CASE WHEN doc_id != component THEN n_chars ELSE 0 END)
                 / sum(n_chars)::DOUBLE * 100, 4) AS char_pct
    FROM assigned
    """,
)
def q_dedup_savings_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The business case in one row: if keep-first near-dup dedup ran
    (n-gram Jaccard >= 0.2 edges), how many docs and characters would
    drop — the saved-tokens number that prices the dedup pass against
    its compute. Composes the proven resolve chain (components read
    from the materialize-once artifact; full-recompute oracle) with
    one conditional aggregate."""
    docs = read_table(spark, sf_dir, "documents")
    pairs = ART.pairs_artifact(spark, sf_dir, "jaccard")
    comp = ART.components_artifact(spark, sf_dir, "jaccard")
    resolved = D.near_dedup_keep_first(
        docs.select("doc_id", "n_chars"), "doc_id", pairs, components=comp
    )
    dropped = F.col("is_representative") == 0
    return resolved.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.count_if(dropped).cast("long").alias("n_dropped"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.sum(F.when(dropped, F.col("n_chars")).otherwise(0))
        .cast("long")
        .alias("chars_dropped"),
        F.round(F.count_if(dropped) / F.count(F.lit(1)).cast("double") * 100, 4).alias(
            "doc_pct"
        ),
        F.round(
            F.sum(F.when(dropped, F.col("n_chars")).otherwise(0))
            / F.sum("n_chars").cast("double")
            * 100,
            4,
        ).alias("char_pct"),
    )


@register(
    "near_dup_components_store",
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
    ), p AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.n AS na, b.n AS nb,
             count(*) AS shared
      FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2, 3, 4
      HAVING shared / (na + nb - shared) >= 0.2
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
    SELECT d.doc_id, coalesce(comp.component, d.doc_id) AS component
    FROM documents d LEFT JOIN comp ON d.doc_id = comp.node
    """,
)
def q_near_dup_components_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The materialize-once artifact itself, surfaced as a query: every
    doc's near-dup component label read from the persisted
    ``operators.artifacts.components_artifact`` parquet (built on first
    touch per corpus fingerprint; singleton docs get their own id). The
    oracle is the FULL recompute (shingles → Jaccard pairs → recursive
    CC), so a hash-green run is the standing proof that the persisted
    store is byte-identical to re-derivation — the invariant every
    artifact consumer (splits, density, savings, agreement,
    incremental merge) rests on."""
    docs = read_table(spark, sf_dir, "documents")
    comp = ART.components_artifact(spark, sf_dir, "jaccard").withColumnRenamed(
        "node", "doc_id"
    )
    return docs.select("doc_id").join(comp, "doc_id", "left").select(
        "doc_id", F.coalesce("component", F.col("doc_id")).alias("component")
    )
