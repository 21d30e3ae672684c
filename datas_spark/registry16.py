"""Registry batch 16 — BM25 ranked retrieval."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from datas_spark.io.sources import read_table
from datas_spark.operators.search import bm25_topk
from datas_spark.registry_core import register

_BM25_TERMS = ["data", "join", "skew"]
_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_TOP = 20

_TERMS_SQL = ", ".join(f"'{t}'" for t in _BM25_TERMS)


@register(
    "bm25_topk",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             list_transform(string_split_regex(trim(text), '\\s+'),
                            w -> lower(w)) AS w
      FROM documents
    ), lens AS (
      SELECT doc_id, len(w)::BIGINT AS dl FROM toks
    ), consts AS (
      SELECT count(*)::BIGINT AS n_docs, sum(dl)::BIGINT AS sum_dl FROM lens
    ), tf AS (
      SELECT doc_id, term, count(*)::BIGINT AS tf
      FROM (SELECT doc_id, unnest(list_filter(w,
              x -> x IN ({_TERMS_SQL}))) AS term FROM toks)
      GROUP BY doc_id, term
    ), dfreq AS (
      SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term
    ), contribs AS (
      SELECT tf.doc_id, tf.term,
        ln(1.0 + (c.n_docs::DOUBLE - d.df + 0.5) / (d.df::DOUBLE + 0.5))
        * tf.tf::DOUBLE * {_BM25_K1 + 1.0}
        / (tf.tf::DOUBLE + {_BM25_K1} * ({1.0 - _BM25_B} + {_BM25_B}
             * l.dl::DOUBLE / (c.sum_dl::DOUBLE / c.n_docs::DOUBLE)))
          AS contrib
      FROM tf JOIN dfreq d USING (term) JOIN lens l USING (doc_id)
      CROSS JOIN consts c
    )
    SELECT doc_id,
           round(list_reduce(list(contrib ORDER BY term), (a, b) -> a + b), 4)
             AS score
    FROM contribs GROUP BY doc_id
    ORDER BY score DESC, doc_id ASC LIMIT {_BM25_TOP}
    """,
)
def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 ranked retrieval over the corpus for a fixed query — the
    lexical-search baseline (Lucene idf variant). Postings filter to
    the query vocabulary BEFORE the explode, corpus constants are one
    exact integer aggregate, and the per-doc score folds contributions
    in term order so it is bit-reproducible (see `operators.search`)."""
    docs = read_table(spark, sf_dir, "documents")
    return bm25_topk(
        docs, "doc_id", "text", _BM25_TERMS, k1=_BM25_K1, b=_BM25_B, top_n=_BM25_TOP
    )


# ---------------------------------------------------------------------------
# CMS inner-product join-size estimation
# ---------------------------------------------------------------------------

_JS_DEPTH = 4
_JS_WIDTH = 2048


@register(
    "join_size_estimate",
    oracle=f"""
    WITH ra AS (
      SELECT i AS row, pos, count(*) AS cnt FROM (
        SELECT i,
          ('0x' || substr(md5(i::VARCHAR || ':' || o_custkey::VARCHAR), 1, 15))::BIGINT
            % {_JS_WIDTH} AS pos
        FROM orders CROSS JOIN (SELECT unnest(range({_JS_DEPTH})) AS i)
        WHERE o_custkey IS NOT NULL
      ) GROUP BY i, pos
    ), rb AS (
      SELECT i AS row, pos, count(*) AS cnt FROM (
        SELECT i,
          ('0x' || substr(md5(i::VARCHAR || ':' || c_custkey::VARCHAR), 1, 15))::BIGINT
            % {_JS_WIDTH} AS pos
        FROM customer CROSS JOIN (SELECT unnest(range({_JS_DEPTH})) AS i)
        WHERE c_custkey IS NOT NULL
      ) GROUP BY i, pos
    ), ip AS (
      SELECT a.row, sum(a.cnt * b.cnt) AS ip
      FROM ra a JOIN rb b ON a.row = b.row AND a.pos = b.pos
      GROUP BY a.row
    )
    SELECT min(coalesce(ip.ip, 0))::BIGINT AS est_join_rows
    FROM (SELECT unnest(range({_JS_DEPTH})) AS row) r
    LEFT JOIN ip ON ip.row = r.row
    """,
)
def q_join_size_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-flight join cardinality: estimate |orders ⋈ customer| from
    two count-min sketches via the inner-product estimator — an upper
    bound on the true join size at two register-table scans' cost
    (`sketches.cms_join_size_estimate`). The optimizer-style answer to
    "can I afford this join?" before shuffling 100 TB."""
    from datas_spark.operators import sketches as SK

    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    ra = SK.cms_registers(orders, "o_custkey", depth=_JS_DEPTH, width=_JS_WIDTH)
    rb = SK.cms_registers(cust, "c_custkey", depth=_JS_DEPTH, width=_JS_WIDTH)
    return SK.cms_join_size_estimate(ra, rb, depth=_JS_DEPTH)
