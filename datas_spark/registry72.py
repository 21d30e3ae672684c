"""Registry batch 72 — leakage-safe split on the cheap banded backend:
the group-safe split composed over SimHash near-dup pairs instead of
exact n-gram Jaccard (the `curate_corpus` backend-choice story applied
to splitting).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datas_spark.io.sources import read_table
from datas_spark.operators import artifacts as ART
from datas_spark.operators.splits import group_safe_split
from datas_spark.registry10 import _simhash_near_dup_oracle
from datas_spark.registry30 import _SPLIT_CASE
from datas_spark.registry_core import register


@register(
    "group_safe_split_simhash",
    oracle=f"""
    WITH RECURSIVE p AS MATERIALIZED ({_simhash_near_dup_oracle(60).strip()}
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
      SELECT d.doc_id, coalesce(comp.component, d.doc_id) AS component
      FROM documents d LEFT JOIN comp ON d.doc_id = comp.node
    )
    SELECT doc_id, component, {_SPLIT_CASE} AS split
    FROM assigned
    """,
)
def q_group_safe_split_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The leakage-safe split with its pair backend swapped to banded
    SimHash (60-bit, hamming <= 3) — signature pass + band equi-join
    instead of the full shingle inverted index, the budget-tier choice
    when the corpus is too big for exact Jaccard edges. Same CC +
    md5-component split downstream; same zero-cross guarantee for the
    edges this backend detects. Pairs + CC read the materialize-once
    simhash-family artifacts (full-recompute oracle keeps the
    hash-proof honest)."""
    docs = read_table(spark, sf_dir, "documents")
    pairs = ART.pairs_artifact(spark, sf_dir, "simhash")
    comp = ART.components_artifact(spark, sf_dir, "simhash")
    return group_safe_split(docs, "doc_id", pairs, components=comp).select(
        "doc_id", "component", "split"
    )
