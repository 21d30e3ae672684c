"""Ranked retrieval: BM25, fusion (RRF), keyness, retrieve-then-rerank.

Consolidated from the former numeric registry batches 16, 21, 63 (round-5 cleanup; query
names unchanged). Each section below keeps its original batch
docstring for provenance."""
from __future__ import annotations

# ==================================================================
# former registry16.py
# ==================================================================

"""Registry batch 16 — BM25 ranked retrieval."""


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

# ==================================================================
# former registry21.py
# ==================================================================

"""Registry batch 21 — retrieval fusion and corpus keyness:
reciprocal-rank fusion of lexical (BM25) and semantic (embedding)
retrieval, and per-source distinctive terms by Dunning's G²
log-likelihood.

Both stay bit-reproducible: ranks are integers, the RRF reciprocal sum
and the G² statistic are single per-row float expressions over exact
integer inputs, rounded to 6 places before any ordering.
"""


from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from datas_spark.functions.text import word_tokens
from datas_spark.io.sources import read_table
from datas_spark.operators import similarity as SIM
from datas_spark.operators.search import bm25_topk, rrf_fuse
from datas_spark.registry_core import register

_RRF_K0 = 60
_RRF_DEPTH = 50  # per-list candidate depth
_RRF_TOP = 20
_RRF_QUERY_VEC = 0  # semantic query: embedding of vec_id 0

# lexical candidate list: BM25 top-_RRF_DEPTH, ranked (registry_search's
# oracle chain, parameterized depth, rank added above the aggregate)
_LEX_CTE = f"""
    toks AS (
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
    ), lex AS (
      SELECT doc_id,
             round(list_reduce(list(contrib ORDER BY term), (a, b) -> a + b), 4)
               AS score
      FROM contribs GROUP BY doc_id
      ORDER BY score DESC, doc_id ASC LIMIT {_RRF_DEPTH}
    ), lexr AS (
      SELECT doc_id,
             row_number() OVER (ORDER BY score DESC, doc_id ASC) AS r
      FROM lex
    )
"""

_SEM_CTE = f"""
    q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = {_RRF_QUERY_VEC}),
    sem AS (
      SELECT d.vec_id AS doc_id,
        round(
          list_sum(list_transform(range(1, len(d.embedding) + 1),
                   i -> d.embedding[i]::DOUBLE * q.qv[i]::DOUBLE))
          / (sqrt(list_sum(list_transform(range(1, len(d.embedding) + 1),
                   i -> d.embedding[i]::DOUBLE * d.embedding[i]::DOUBLE)))
           * sqrt(list_sum(list_transform(range(1, len(q.qv) + 1),
                   i -> q.qv[i]::DOUBLE * q.qv[i]::DOUBLE)))), 6) AS cos
      FROM embeddings d CROSS JOIN q
    ), semr AS (
      SELECT doc_id, r FROM (
        SELECT doc_id,
               row_number() OVER (ORDER BY cos DESC, doc_id ASC) AS r
        FROM sem
      ) WHERE r <= {_RRF_DEPTH}
    )
"""


@register(
    "hybrid_search_rrf",
    oracle=f"""
    WITH {_LEX_CTE}, {_SEM_CTE}
    SELECT coalesce(l.doc_id, s.doc_id) AS doc_id,
           round(coalesce(1.0 / ({_RRF_K0} + l.r), 0.0)
                 + coalesce(1.0 / ({_RRF_K0} + s.r), 0.0), 6) AS rrf_score,
           ((l.doc_id IS NOT NULL)::INT + (s.doc_id IS NOT NULL)::INT)::INT
             AS n_lists
    FROM lexr l FULL OUTER JOIN semr s ON l.doc_id = s.doc_id
    ORDER BY rrf_score DESC, doc_id ASC LIMIT {_RRF_TOP}
    """,
)
def q_hybrid_search_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: BM25 lexical top-50 and embedding-cosine
    semantic top-50 (query = vec_id 0's embedding; doc ids and vec ids
    share one id space) fused by reciprocal-rank fusion
    ``Σ 1/(60 + rank)`` — rank-based, so no score calibration between
    the two retrievers is needed.

    Scale shape: each retriever already reduces the corpus to a k-row
    candidate list with its own scale-safe plan (query-vocab-filtered
    postings; bucketed cosine rank with a broadcast 1-row query), so
    the fusion join, reciprocal sum, and final sort all run on ≤ 50-row
    frames. The only global windows rank k-row aggregates, never raw
    rows."""
    docs = read_table(spark, sf_dir, "documents")
    emb = read_table(spark, sf_dir, "embeddings")
    lex = bm25_topk(
        docs, "doc_id", "text", _BM25_TERMS, k1=_BM25_K1, b=_BM25_B,
        top_n=_RRF_DEPTH,
    )
    lexr = lex.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.desc("score"), F.asc("doc_id")))
        .alias("rank"),
    )
    sem = SIM.cosine_topk(
        emb,
        emb.where(F.col("vec_id") == _RRF_QUERY_VEC),
        "vec_id",
        "vec_id",
        "embedding",
        k=_RRF_DEPTH,
    )
    semr = sem.select(F.col("d_vec_id").alias("doc_id"), "rank")
    return rrf_fuse([lexr, semr], "doc_id", k0=_RRF_K0, top_n=_RRF_TOP)


# ---------------------------------------------------------------------------
# per-source distinctive terms (Dunning G² log-likelihood keyness)
# ---------------------------------------------------------------------------

_KEY_MIN_COUNT = 3
_KEY_TOP = 5


@register(
    "source_keyness_terms",
    oracle=f"""
    WITH toks AS (
      SELECT source, unnest(list_transform(
               string_split_regex(trim(text), '\\s+'), w -> lower(w))) AS term
      FROM documents
    ), tk AS (
      SELECT source, term FROM toks WHERE term <> ''
    ), a AS (
      SELECT source, term, count(*)::BIGINT AS a FROM tk GROUP BY source, term
    ), termtot AS (
      SELECT term, sum(a)::BIGINT AS tot_t FROM a GROUP BY term
    ), srctot AS (
      SELECT source, sum(a)::BIGINT AS n1 FROM a GROUP BY source
    ), grand AS (
      SELECT sum(a)::BIGINT AS n FROM a
    ), g2 AS (
      -- ratios of DOUBLEs, not BIGINT products: a*N overflows int64 at
      -- corpus scale (N ~ 1e13, a ~ 1e6 for a stopword); the double
      -- conversion + one division + ln is deterministic on both engines
      SELECT a.source, a.term, a.a,
        round(2.0 * (
          a.a::DOUBLE * ln((a.a::DOUBLE * g.n::DOUBLE)
                           / (s.n1::DOUBLE * t.tot_t::DOUBLE))
          + CASE WHEN t.tot_t - a.a > 0 THEN
              (t.tot_t - a.a)::DOUBLE
              * ln(((t.tot_t - a.a)::DOUBLE * g.n::DOUBLE)
                   / ((g.n - s.n1)::DOUBLE * t.tot_t::DOUBLE))
            ELSE 0.0 END), 6) AS g2
      FROM a JOIN termtot t USING (term) JOIN srctot s USING (source)
      CROSS JOIN grand g
      WHERE a.a >= {_KEY_MIN_COUNT}
        AND a.a::DOUBLE * g.n::DOUBLE > s.n1::DOUBLE * t.tot_t::DOUBLE
    )
    SELECT source, term, a AS cnt, g2 FROM (
      SELECT *, row_number() OVER (PARTITION BY source
                                   ORDER BY g2 DESC, term ASC) AS rk
      FROM g2
    ) WHERE rk <= {_KEY_TOP}
    ORDER BY source, g2 DESC, term
    """,
)
def q_source_keyness_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinctive vocabulary per source: Dunning's G² log-likelihood
    keyness of each term in a source vs the rest of the corpus, top 5
    overrepresented terms per source — the corpus-linguistics standard
    for "what makes this slice different" (domain tagging, contamination
    triage, mixture auditing).

    All four count frames (term-in-source, term total, source total,
    grand total) are exact BIGINT aggregates of ONE tokenization pass;
    G² is a single per-row float expression over those integers
    (b = tot_t − a and n2 = N − n1 are derived, not re-counted), so the
    statistic is order-independent. The grand total broadcasts as one
    row; the top-5 window is partitioned by source."""
    docs = read_table(spark, sf_dir, "documents")
    tk = (
        docs.select(
            "source",
            F.explode(F.transform(word_tokens("text"), lambda w: F.lower(w))).alias(
                "term"
            ),
        )
        .where(F.col("term") != "")
    )
    a = tk.groupBy("source", "term").agg(F.count("*").cast("long").alias("a"))
    termtot = a.groupBy("term").agg(F.sum("a").cast("long").alias("tot_t"))
    srctot = a.groupBy("source").agg(F.sum("a").cast("long").alias("n1"))
    grand = a.agg(F.sum("a").cast("long").alias("n"))
    j = (
        a.join(termtot, "term")
        .join(F.broadcast(srctot), "source")
        .crossJoin(F.broadcast(grand))
        .where(
            (F.col("a") >= _KEY_MIN_COUNT)
            & (
                F.col("a").cast("double") * F.col("n").cast("double")
                > F.col("n1").cast("double") * F.col("tot_t").cast("double")
            )
        )
    )
    # ratios of doubles, never BIGINT products — a*N overflows int64 at
    # 100 TB corpus scale; per-value double conversion stays exact for
    # counts < 2^53 and deterministic beyond
    b = F.col("tot_t") - F.col("a")
    term1 = F.col("a").cast("double") * F.log(
        (F.col("a").cast("double") * F.col("n").cast("double"))
        / (F.col("n1").cast("double") * F.col("tot_t").cast("double"))
    )
    term2 = F.when(
        b > 0,
        b.cast("double")
        * F.log(
            (b.cast("double") * F.col("n").cast("double"))
            / (
                (F.col("n") - F.col("n1")).cast("double")
                * F.col("tot_t").cast("double")
            )
        ),
    ).otherwise(F.lit(0.0))
    g2 = j.select(
        "source",
        "term",
        F.col("a").alias("cnt"),
        F.round(2.0 * (term1 + term2), 6).alias("g2"),
    )
    rk = Window.partitionBy("source").orderBy(F.desc("g2"), F.asc("term"))
    return (
        g2.withColumn("rk", F.row_number().over(rk))
        .where(F.col("rk") <= _KEY_TOP)
        .drop("rk")
        .orderBy("source", F.desc("g2"), "term")
    )

# ==================================================================
# former registry63.py
# ==================================================================

"""Registry batch 63 — retrieve-then-rerank composition: BM25
candidate generation → cross-encoder rerank at the pandas_udf boundary
(deterministic md5 proxy, as for every model scorer) → final top-k.
The two-stage retrieval shape every RAG/search pipeline runs.
"""


from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from datas_spark.io.sources import read_table
from datas_spark.operators.scoring import hash_unit_interval
from datas_spark.operators.search import bm25_topk
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


_QL_MU = 2000.0


@register(
    "ql_dirichlet_topk",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             list_transform(string_split_regex(trim(text), '\\s+'),
                            w -> lower(w)) AS w
      FROM documents
    ), lens AS (
      SELECT doc_id, len(w)::BIGINT AS dl FROM toks
    ), consts AS (
      SELECT sum(dl)::BIGINT AS sum_dl FROM lens
    ), tf AS (
      SELECT doc_id, term, count(*)::BIGINT AS tf
      FROM (SELECT doc_id, unnest(list_filter(w,
              x -> x IN ({_TERMS_SQL}))) AS term FROM toks)
      GROUP BY doc_id, term
    ), cf AS (
      SELECT term, sum(tf)::BIGINT AS cf FROM tf GROUP BY term
    ), nq AS (
      SELECT count(*)::BIGINT AS n_terms FROM cf
    ), m AS (
      SELECT tf.doc_id,
        list_reduce(
          list(ln(1.0 + tf.tf::DOUBLE
                  / ({_QL_MU} * cf.cf::DOUBLE / c.sum_dl::DOUBLE))
               ORDER BY tf.term),
          (a, b) -> a + b) AS m
      FROM tf JOIN cf USING (term) CROSS JOIN consts c
      GROUP BY tf.doc_id
    )
    SELECT l.doc_id,
           round(coalesce(m.m, 0.0)
                 + nq.n_terms::DOUBLE
                   * ln({_QL_MU} / (l.dl::DOUBLE + {_QL_MU})), 4) AS score
    FROM lens l LEFT JOIN m USING (doc_id) CROSS JOIN nq
    ORDER BY score DESC, doc_id ASC LIMIT {_BM25_TOP}
    """,
)
def q_ql_dirichlet_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dirichlet-smoothed query-likelihood retrieval
    (`search.ql_dirichlet_topk`, Zhai & Lafferty 2001) for the same
    fixed query as `bm25_topk` — the language-modeling scorer next to
    the probabilistic one; `hybrid_search_rrf` can fuse either. Every
    document scores (the smoothing adjustment depends on doc length),
    postings still filter to the query vocabulary before the explode,
    and per-doc folds run in term order."""
    from datas_spark.operators.search import ql_dirichlet_topk

    docs = read_table(spark, sf_dir, "documents")
    return ql_dirichlet_topk(
        docs, "doc_id", "text", _BM25_TERMS, mu=_QL_MU, top_n=_BM25_TOP
    )


@register(
    "lexical_rrf_fusion",
    oracle=f"""
    WITH {_LEX_CTE},
    cf AS (
      SELECT term, sum(tf)::BIGINT AS cf FROM tf GROUP BY term
    ), nq AS (
      SELECT count(*)::BIGINT AS n_terms FROM cf
    ), qm AS (
      SELECT tf.doc_id,
        list_reduce(
          list(ln(1.0 + tf.tf::DOUBLE
                  / ({_QL_MU} * cf.cf::DOUBLE / c.sum_dl::DOUBLE))
               ORDER BY tf.term),
          (a, b) -> a + b) AS m
      FROM tf JOIN cf USING (term) CROSS JOIN consts c
      GROUP BY tf.doc_id
    ), qls AS (
      SELECT l.doc_id,
             round(coalesce(qm.m, 0.0)
                   + nq.n_terms::DOUBLE
                     * ln({_QL_MU} / (l.dl::DOUBLE + {_QL_MU})), 4) AS score
      FROM lens l LEFT JOIN qm USING (doc_id) CROSS JOIN nq
      ORDER BY score DESC, doc_id ASC LIMIT {_RRF_DEPTH}
    ), qlr AS (
      SELECT doc_id,
             row_number() OVER (ORDER BY score DESC, doc_id ASC) AS r
      FROM qls
    )
    SELECT coalesce(l.doc_id, s.doc_id) AS doc_id,
           round(coalesce(1.0 / ({_RRF_K0} + l.r), 0.0)
                 + coalesce(1.0 / ({_RRF_K0} + s.r), 0.0), 6) AS rrf_score,
           ((l.doc_id IS NOT NULL)::INT + (s.doc_id IS NOT NULL)::INT)::INT
             AS n_lists
    FROM lexr l FULL OUTER JOIN qlr s ON l.doc_id = s.doc_id
    ORDER BY rrf_score DESC, doc_id ASC LIMIT {_RRF_TOP}
    """,
)
def q_lexical_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-scorer lexical fusion: BM25 top-50 and Dirichlet-QL top-50
    for the same query fused by reciprocal rank — the probabilistic and
    language-modeling scorers rank the tail differently (QL's length
    smoothing vs BM25's saturation), and RRF harvests the agreement
    without score calibration. Both retrievers reduce the corpus to
    50-row candidate frames before any fusion work."""
    from datas_spark.operators.search import bm25_topk as _bm25
    from datas_spark.operators.search import ql_dirichlet_topk as _ql
    from datas_spark.operators.search import rrf_fuse as _fuse

    docs = read_table(spark, sf_dir, "documents")
    lex = _bm25(
        docs, "doc_id", "text", _BM25_TERMS,
        k1=_BM25_K1, b=_BM25_B, top_n=_RRF_DEPTH,
    )
    lexr = lex.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.desc("score"), F.asc("doc_id")))
        .alias("rank"),
    )
    ql = _ql(docs, "doc_id", "text", _BM25_TERMS, mu=_QL_MU, top_n=_RRF_DEPTH)
    qlr = ql.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.desc("score"), F.asc("doc_id")))
        .alias("rank"),
    )
    return _fuse([lexr, qlr], "doc_id", k0=_RRF_K0, top_n=_RRF_TOP)


_RM3_FB_DOCS = 10
_RM3_FB_TERMS = 10
_RM3_LAM = 0.5

_RM3_ORACLE = f"""
    WITH toks AS (
      SELECT doc_id,
             list_transform(string_split_regex(trim(text), '\\s+'),
                            w -> lower(w)) AS w
      FROM documents
    ), lens AS (
      SELECT doc_id, len(w)::BIGINT AS dl FROM toks
    ), consts AS (
      SELECT sum(dl)::BIGINT AS sum_dl FROM lens
    ), tf1 AS (
      SELECT doc_id, term, count(*)::BIGINT AS tf
      FROM (SELECT doc_id, unnest(list_filter(w,
              x -> x IN ({_TERMS_SQL}))) AS term FROM toks)
      GROUP BY doc_id, term
    ), cf1 AS (
      SELECT term, sum(tf)::BIGINT AS cf FROM tf1 GROUP BY term
    ), nq1 AS (
      SELECT count(*)::BIGINT AS n_terms FROM cf1
    ), m1 AS (
      SELECT tf1.doc_id,
        list_reduce(
          list(ln(1.0 + tf1.tf::DOUBLE
                  / ({_QL_MU} * cf1.cf::DOUBLE / c.sum_dl::DOUBLE))
               ORDER BY tf1.term),
          (a, b) -> a + b) AS m
      FROM tf1 JOIN cf1 USING (term) CROSS JOIN consts c
      GROUP BY tf1.doc_id
    ), pass1 AS (
      SELECT l.doc_id,
             coalesce(m1.m, 0.0)
             + nq1.n_terms::DOUBLE
               * ln({_QL_MU} / (l.dl::DOUBLE + {_QL_MU})) AS score
      FROM lens l LEFT JOIN m1 USING (doc_id) CROSS JOIN nq1
    ), fb AS (
      SELECT doc_id, score FROM pass1
      ORDER BY score DESC, doc_id ASC LIMIT {_RM3_FB_DOCS}
    ), fbw AS (
      SELECT doc_id,
             exp(score - (SELECT max(score) FROM fb))
               / (SELECT sum(exp(score - (SELECT max(score) FROM fb)))
                  FROM fb) AS wd
      FROM fb
    ), fb_tf AS (
      SELECT t.doc_id, term, count(*)::BIGINT AS tf
      FROM (SELECT doc_id, unnest(w) AS term FROM toks
            WHERE doc_id IN (SELECT doc_id FROM fb)) t
      GROUP BY 1, 2
    ), rm1 AS (
      SELECT term,
        list_reduce(
          list(fbw.wd * fb_tf.tf::DOUBLE / l.dl::DOUBLE
               ORDER BY fb_tf.doc_id),
          (a, b) -> a + b) AS p_rm1
      FROM fb_tf JOIN fbw USING (doc_id) JOIN lens l USING (doc_id)
      GROUP BY term
    ), rm1u AS (
      SELECT term, sum(p_rm1) AS p_rm1 FROM (
        SELECT term, p_rm1 FROM rm1
        UNION ALL
        SELECT unnest([{_TERMS_SQL}]) AS term, 0.0 AS p_rm1
      ) GROUP BY term
    ), expansion AS (
      SELECT term, CAST(round(p * 1e6) AS BIGINT) AS w_e6 FROM (
        SELECT term,
               {_RM3_LAM} * (CASE WHEN term IN ({_TERMS_SQL})
                             THEN 1.0 / 3.0 ELSE 0.0 END)
             + (1.0 - {_RM3_LAM}) * p_rm1 AS p
        FROM rm1u
        ORDER BY p DESC, term ASC LIMIT {_RM3_FB_TERMS}
      ) WHERE CAST(round(p * 1e6) AS BIGINT) > 0
    ), tf2 AS (
      SELECT u.doc_id, u.term, count(*)::BIGINT AS tf
      FROM (SELECT doc_id, unnest(w) AS term FROM toks) u
      SEMI JOIN expansion e ON u.term = e.term
      GROUP BY 1, 2
    ), cf2 AS (
      SELECT term, sum(tf)::BIGINT AS cf FROM tf2 GROUP BY term
    ), wt AS (
      SELECT sum(e.w_e6)::DOUBLE / 1e6 AS w_total
      FROM cf2 JOIN expansion e USING (term)
    ), m2 AS (
      SELECT tf2.doc_id,
        list_reduce(
          list((e.w_e6::DOUBLE / 1e6)
               * ln(1.0 + tf2.tf::DOUBLE
                    / ({_QL_MU} * cf2.cf::DOUBLE / c.sum_dl::DOUBLE))
               ORDER BY tf2.term),
          (a, b) -> a + b) AS m
      FROM tf2 JOIN cf2 USING (term) JOIN expansion e USING (term)
      CROSS JOIN consts c
      GROUP BY tf2.doc_id
    )
    SELECT l.doc_id,
           round(coalesce(m2.m, 0.0)
                 + wt.w_total
                   * ln({_QL_MU} / (l.dl::DOUBLE + {_QL_MU})), 4) AS score
    FROM lens l LEFT JOIN m2 USING (doc_id) CROSS JOIN wt
    ORDER BY score DESC, doc_id ASC LIMIT {_BM25_TOP}
"""


@register("rm3_expanded_topk", oracle=_RM3_ORACLE)
def q_rm3_expanded_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RM3 pseudo-relevance feedback (`search.rm3_expanded_topk`,
    Abdul-Jaleel 2004) for the same fixed query as `bm25_topk` /
    `ql_dirichlet_topk`: QL pass one, softmax-weighted relevance model
    over the top-10 feedback docs, λ=0.5 interpolation with the
    uniform query model, top-10 e6-quantized expansion terms, weighted
    QL pass two. The oracle replays both passes, the softmax, RM1's
    doc-ordered folds, and the expansion election end to end."""
    from datas_spark.operators.search import rm3_expanded_topk

    docs = read_table(spark, sf_dir, "documents")
    return rm3_expanded_topk(
        docs, "doc_id", "text", _BM25_TERMS, mu=_QL_MU,
        fb_docs=_RM3_FB_DOCS, fb_terms=_RM3_FB_TERMS, lam=_RM3_LAM,
        top_n=_BM25_TOP,
    )


# ---------------------------------------------------------------------------
# round 10: late-interaction (MaxSim) rerank tier (VERDICT r9 #8) —
# ColBERT-style token-level relevance over the md5 proxy token
# embeddings, candidates from BM25 recall; recall-vs-exact as a query.
# ---------------------------------------------------------------------------

_MAXSIM_DIM = 8
_MAXSIM_RECALL = 50
_MAXSIM_TOP = 20
_MAXSIM_DOC_TOKENS = 64

_MS_UNIT = "(('0x' || substr(md5({key}), 1, 8))::BIGINT / 4294967296.0)"


def _ms_emb_sql(expr: str) -> str:
    comps = ", ".join(
        f"({_MS_UNIT.format(key=f'''{expr} || '#emb{i}' ''')} - 0.5)"
        for i in range(_MAXSIM_DIM)
    )
    return f"[{comps}]"


def _ms_fold(lst: str) -> str:
    return f"list_reduce(list_prepend(0.0, {lst}), (a, b) -> a + b)"


def _maxsim_ctes(with_cand: bool, src: str = "documents") -> str:
    """Shared CTE chain: BM25 candidate stage (optional gate) + the
    per-(doc, term) token-max cosines + the sorted-term fold.
    ``src`` swaps the corpus (e.g. the md5-elected sample CTE of
    `maxsim_recall_sampled` — BM25 constants then come from the
    sub-corpus, mirroring the Spark side exactly)."""
    rng = f"range(1, {_MAXSIM_DIM + 1})"
    dot = _ms_fold(f"list_transform({rng}, i -> ew[i] * et[i])")
    na = _ms_fold(f"list_transform({rng}, i -> ew[i] * ew[i])")
    nb = _ms_fold(f"list_transform({rng}, i -> et[i] * et[i])")
    gate = (
        "SEMI JOIN cand c ON t.doc_id = c.doc_id" if with_cand else ""
    )
    return f"""
    toks AS (
      SELECT doc_id,
             list_transform(string_split_regex(trim(text), '\\s+'),
                            w -> lower(w)) AS w
      FROM {src}
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
    ), cand AS (
      SELECT doc_id FROM (
        SELECT doc_id,
               round(list_reduce(list(contrib ORDER BY term), (a, b) -> a + b), 4)
                 AS score
        FROM contribs GROUP BY doc_id
      ) ORDER BY score DESC, doc_id ASC LIMIT {_MAXSIM_RECALL}
    ), cembs AS MATERIALIZED (
      SELECT doc_id, {_ms_emb_sql("tok")} AS ew
      FROM (SELECT t.doc_id,
                   unnest(list_filter(t.w, x -> length(x) > 0)
                          [1:{_MAXSIM_DOC_TOKENS}]) AS tok
            FROM toks t {gate})
    ), qterms AS (
      SELECT term, {_ms_emb_sql("term")} AS et
      FROM (SELECT unnest([{_TERMS_SQL}]) AS term)
    ), parts AS (
      SELECT e.doc_id, q.term,
             {dot} AS dot, {na} AS na, {nb} AS nb
      FROM cembs e CROSS JOIN qterms q
    ), tcos AS (
      SELECT doc_id, term,
             CASE WHEN (sqrt(na) * sqrt(nb)) > 0
                  THEN dot / (sqrt(na) * sqrt(nb)) END AS cs
      FROM parts
    ), permax AS (
      SELECT doc_id, term, max(cs) AS mx FROM tcos GROUP BY 1, 2
    ), scored_docs AS (
      SELECT doc_id FROM {"cand" if with_cand else "toks"}
    ), summed AS (
      SELECT s.doc_id,
             round({_ms_fold("list(coalesce(p.mx, 0.0) ORDER BY t.term)")}, 6)
               AS maxsim
      FROM scored_docs s
      CROSS JOIN (SELECT unnest([{_TERMS_SQL}]) AS term) t
      LEFT JOIN permax p ON p.doc_id = s.doc_id AND p.term = t.term
      GROUP BY s.doc_id
    )"""


_MAXSIM_RERANK_ORACLE = f"""
    WITH {_maxsim_ctes(with_cand=True)}
    SELECT doc_id, maxsim FROM summed
    ORDER BY maxsim DESC, doc_id ASC LIMIT {_MAXSIM_TOP}
"""

_MAXSIM_RECALL_TAIL = f"""
    exct AS (
      SELECT doc_id FROM summed
      ORDER BY maxsim DESC, doc_id ASC LIMIT {_MAXSIM_TOP}
    ), appr AS (
      SELECT doc_id FROM (
        SELECT s.doc_id, s.maxsim FROM summed s SEMI JOIN cand c
          ON s.doc_id = c.doc_id
      ) ORDER BY maxsim DESC, doc_id ASC LIMIT {_MAXSIM_TOP}
    )
    SELECT (SELECT count(*) FROM exct)::BIGINT AS n_exact,
           (SELECT count(*) FROM exct e SEMI JOIN appr a
              ON e.doc_id = a.doc_id)::BIGINT AS n_hit,
           round((SELECT count(*) FROM exct e SEMI JOIN appr a
                    ON e.doc_id = a.doc_id)::DOUBLE
                 / (SELECT count(*) FROM exct)::DOUBLE * 100, 4) AS recall_pct
"""

_MAXSIM_RECALL_ORACLE = f"""
    WITH {_maxsim_ctes(with_cand=False)},
    {_MAXSIM_RECALL_TAIL}
"""

_MAXSIM_SAMPLE_N = 400

_MAXSIM_RECALL_SAMPLED_ORACLE = f"""
    WITH samp AS MATERIALIZED (
      SELECT doc_id, text FROM (
        SELECT doc_id, text, md5(doc_id::VARCHAR) AS h FROM documents
        ORDER BY h, doc_id LIMIT {_MAXSIM_SAMPLE_N}
      )
    ), {_maxsim_ctes(with_cand=False, src="samp")},
    {_MAXSIM_RECALL_TAIL}
"""


@register("maxsim_rerank_topk", oracle=_MAXSIM_RERANK_ORACLE)
def q_maxsim_rerank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-interaction retrieval (`search.maxsim_rerank_topk`,
    Khattab & Zaharia 2020): BM25 recalls 50 candidates, then per
    query token the best-matching document-token cosine (md5 proxy
    embeddings, dim 8, first-64-token budget) sums to the MaxSim
    score — both stages, the token interaction matrix, and the
    sorted-term fold replay in the oracle."""
    from datas_spark.operators.search import maxsim_rerank_topk

    docs = read_table(spark, sf_dir, "documents")
    return maxsim_rerank_topk(
        docs, "doc_id", "text", _BM25_TERMS,
        k1=_BM25_K1, b=_BM25_B,
        recall_n=_MAXSIM_RECALL, top_n=_MAXSIM_TOP,
        emb_dim=_MAXSIM_DIM, max_doc_tokens=_MAXSIM_DOC_TOKENS,
    )


@register("maxsim_recall_sampled", oracle=_MAXSIM_RECALL_SAMPLED_ORACLE)
def q_maxsim_recall_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`maxsim_recall_report` with the SAMPLED exact arm (VERDICT r10
    #5): both arms run inside a deterministic (md5(id), id)-elected
    400-doc sub-corpus, so the exact token-interaction cost is
    CONSTANT in corpus size — the 100 TB estimator; the full-corpus
    report stays registered for small-sf sign-off. Sample election,
    sample-local BM25 constants, both retrieval chains and the hit
    counting all replay in the oracle."""
    from datas_spark.operators.search import maxsim_recall_sampled

    docs = read_table(spark, sf_dir, "documents")
    return maxsim_recall_sampled(
        docs, "doc_id", "text", _BM25_TERMS,
        exact_sample_n=_MAXSIM_SAMPLE_N,
        k1=_BM25_K1, b=_BM25_B,
        recall_n=_MAXSIM_RECALL, top_n=_MAXSIM_TOP,
        emb_dim=_MAXSIM_DIM, max_doc_tokens=_MAXSIM_DOC_TOKENS,
    )


@register("maxsim_recall_report", oracle=_MAXSIM_RECALL_ORACLE)
def q_maxsim_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall of the BM25-gated MaxSim top-20 against exact MaxSim over
    the whole corpus — the `ann_recall_report` discipline applied to
    the late-interaction tier: the recall trade of the lexical gate is
    itself a hash-checked number."""
    from datas_spark.operators.search import maxsim_recall_report

    docs = read_table(spark, sf_dir, "documents")
    return maxsim_recall_report(
        docs, "doc_id", "text", _BM25_TERMS,
        k1=_BM25_K1, b=_BM25_B,
        recall_n=_MAXSIM_RECALL, top_n=_MAXSIM_TOP,
        emb_dim=_MAXSIM_DIM, max_doc_tokens=_MAXSIM_DOC_TOKENS,
    )
