"""Registry batch 63 — retrieve-then-rerank composition: BM25
candidate generation → cross-encoder rerank at the pandas_udf boundary
(deterministic md5 proxy, as for every model scorer) → final top-k.
The two-stage retrieval shape every RAG/search pipeline runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from datas_spark.io.sources import read_table
from datas_spark.operators.scoring import hash_unit_interval
from datas_spark.operators.search import bm25_topk
from datas_spark.registry16 import (
    _BM25_B,
    _BM25_K1,
    _BM25_TERMS,
    _BM25_TOP,
)
from datas_spark.registry_core import ORACLES, register

_QUERY_TEXT = " ".join(_BM25_TERMS)
_RERANK_TOP = 10


@register(
    "bm25_rerank_proxy",
    oracle=f"""
    WITH cand AS (
      {ORACLES["bm25_topk"]}
    ), scored AS (
      SELECT c.doc_id, c.score AS bm25_score,
             round(('0x' || substr(md5('{_QUERY_TEXT}' || ':' || d.text), 1, 8))
                   ::BIGINT / 4294967296.0, 6) AS ce_score
      FROM cand c JOIN documents d USING (doc_id)
    )
    SELECT doc_id, bm25_score, ce_score,
           row_number() OVER (ORDER BY ce_score DESC, doc_id ASC) AS rank
    FROM scored
    ORDER BY rank LIMIT {_RERANK_TOP}
    """,
)
def q_bm25_rerank_proxy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage retrieval: BM25 recalls {_BM25_TOP} candidates, a
    cross-encoder scores (query, doc) pairs and the top {_RERANK_TOP}
    re-rank by that score. The cross-encoder is the engine's standard
    deterministic md5 proxy at the same column boundary a real model
    plugs into (`operators/scoring.py`) — so the WHOLE composition,
    retrieval scores included, hash-checks against the oracle.

    Scale shape: rerank cost is O(candidates), not O(corpus) — the
    expensive model touches {_BM25_TOP} rows; the final window ranks
    {_BM25_TOP} rows."""
    docs = read_table(spark, sf_dir, "documents")
    cand = bm25_topk(
        docs, "doc_id", "text", _BM25_TERMS, k1=_BM25_K1, b=_BM25_B, top_n=_BM25_TOP
    ).select("doc_id", F.col("score").alias("bm25_score"))
    scored = cand.join(docs.select("doc_id", "text"), "doc_id").select(
        "doc_id",
        "bm25_score",
        F.round(
            hash_unit_interval(F.concat(F.lit(_QUERY_TEXT), F.lit(":"), F.col("text"))),
            6,
        ).alias("ce_score"),
    )
    ranked = scored.withColumn(
        "rank",
        F.row_number().over(Window.orderBy(F.desc("ce_score"), F.asc("doc_id"))),
    )
    return ranked.where(F.col("rank") <= _RERANK_TOP).select(
        "doc_id", "bm25_score", "ce_score", "rank"
    )
