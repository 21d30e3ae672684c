"""Full-text ranked retrieval: BM25 scoring over the corpus — the
lexical-search counterpart of the embedding ANN family (`similarity`),
and the retrieval baseline every RAG/data-curation stack starts from.

Scale shape: the score needs only the QUERY terms' postings, so the
per-doc term-frequency aggregate filters to the query vocabulary
BEFORE the explode-groupBy (the predicate reaches the token generator;
the shuffle carries |matching docs x query terms| rows, not the whole
inverted index). Document length and the corpus constants (N, avgdl)
are one exact integer aggregate broadcast back. Top-k is
TakeOrderedAndProject.

Determinism: tf/df/dl are exact integers; avgdl is an exact
bigint-sum / bigint-count; idf is a per-row ln of those scalars — no
cross-row float accumulation anywhere, so scores reproduce bit-for-bit
in the DuckDB oracle (rounded at the output boundary only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from datas_spark.functions.text import word_tokens

__all__ = [
    "bm25_topk",
    "rrf_fuse",
    "ql_dirichlet_topk",
    "rm3_expanded_topk",
    "maxsim_scores",
    "maxsim_rerank_topk",
    "maxsim_recall_report",
]


def bm25_topk(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    top_n: int = 20,
) -> DataFrame:
    """Top-``top_n`` documents by BM25 against ``query_terms``
    (lowercased whitespace tokens): ``(id_col, score double)``,
    deterministic tie-break on the id.

    Robertson/Sparck-Jones idf with the +1 floor (Lucene's variant):
    ``ln(1 + (N - df + 0.5)/(df + 0.5))`` — never negative, so
    stop-word-ish query terms cannot flip rankings.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    terms = [t.lower() for t in query_terms]

    toks = docs.select(
        F.col(id_col),
        F.transform(word_tokens(text_col), lambda w: F.lower(w)).alias("__w"),
    )
    # exact integer doc lengths + corpus constants (one tiny aggregate)
    # lens feeds every consumer below (corpus constants + the length-
    # adjustment join) — unpinned, each consumer re-ran the full-corpus
    # tokenize (round 12, guide §2.4). The checkpoint is a NARROW
    # (id, dl) frame: 16 bytes/row even at 100 TB.
    lens = toks.select(
        F.col(id_col), F.size("__w").cast("long").alias("dl")
    ).localCheckpoint(eager=False)
    consts = lens.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("dl").cast("long").alias("sum_dl"),
    )
    # postings restricted to the query vocabulary BEFORE the explode
    tf = (
        toks.select(
            F.col(id_col),
            F.explode(
                F.filter(F.col("__w"), lambda w: w.isin(terms))
            ).alias("term"),
        )
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))

    scored = (
        tf.join(broadcast(df_), "term")
        .join(lens, id_col)
        .crossJoin(broadcast(consts))
    )
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs").cast("double")
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs").cast("double") - F.col("df") + F.lit(0.5))
        / (F.col("df").cast("double") + F.lit(0.5))
    )
    tf_d = F.col("tf").cast("double")
    denom = tf_d + F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("dl").cast("double") / avgdl
    )
    contrib = idf * tf_d * F.lit(k1 + 1.0) / denom
    # fold per-doc contributions in TERM order: a bare sum() over
    # doubles depends on row arrival order; sorting the (term, contrib)
    # pairs first makes the score bit-reproducible across engines
    return (
        scored.select(
            F.col(id_col), F.struct(F.col("term"), contrib.alias("c")).alias("tc")
        )
        .groupBy(id_col)
        .agg(
            F.round(
                F.aggregate(
                    F.array_sort(F.collect_list("tc")),
                    F.lit(0.0),
                    lambda acc, x: acc + x["c"],
                ),
                4,
            ).alias("score")
        )
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(top_n)
    )


def rrf_fuse(
    rankings: list[DataFrame],
    id_col: str,
    rank_col: str = "rank",
    k0: int = 60,
    top_n: int = 20,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al., SIGIR'09) of N ranked
    lists into one: ``score = Σ_lists 1/(k0 + rank)``, summing only the
    lists where the id appears. Returns ``(id_col, rrf_score, n_lists)``
    ordered by score desc with an id tie-break — the standard way to
    combine lexical (BM25) and semantic (embedding) retrieval without
    score calibration, since ranks are scale-free.

    Scale shape: each input is already a tiny top-k frame (≤ a few
    hundred rows — the output of a retrieval query, never a corpus), so
    the outer joins and the final sort are on k-sized data; the
    reciprocal sum folds the per-list terms in list order, making the
    float score order-independent and bit-reproducible.
    """
    if not rankings:
        raise ValueError("rankings must be non-empty")
    fused = None
    for i, r in enumerate(rankings):
        part = r.select(
            F.col(id_col),
            (1.0 / (F.lit(float(k0)) + F.col(rank_col).cast("double"))).alias(
                f"__rr{i}"
            ),
        )
        fused = part if fused is None else fused.join(part, id_col, "full_outer")
    terms = [F.coalesce(F.col(f"__rr{i}"), F.lit(0.0)) for i in range(len(rankings))]
    score = terms[0]
    for t in terms[1:]:
        score = score + t
    present = [
        F.when(F.col(f"__rr{i}").isNotNull(), 1).otherwise(0)
        for i in range(len(rankings))
    ]
    n_lists = present[0]
    for p in present[1:]:
        n_lists = n_lists + p
    return (
        fused.select(
            F.col(id_col),
            F.round(score, 6).alias("rrf_score"),
            n_lists.cast("int").alias("n_lists"),
        )
        .orderBy(F.desc("rrf_score"), F.asc(id_col))
        .limit(top_n)
    )


def ql_dirichlet_topk(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: list[str],
    mu: float = 2000.0,
    top_n: int = 20,
) -> DataFrame:
    """Top-``top_n`` documents by Dirichlet-smoothed query likelihood
    (Zhai & Lafferty 2001) — the language-modeling retrieval twin of
    `bm25_topk` (the other classic lexical scorer; disagreement
    between the two is itself a ranking-quality signal for `rrf_fuse`):

        score(d) = Σ_t ln(1 + tf(t,d) / (μ·p(t|C))) + |q|·ln(μ/(|d|+μ)),
        p(t|C) = cf(t) / Σ|d|

    Query terms absent from the corpus (p = 0) are dropped and |q|
    shrinks accordingly — the standard zero-probability convention.
    Note the per-doc length adjustment means EVERY document scores
    (longer docs pay more smoothing), unlike BM25 where unmatched
    docs drop out.

    Scale shape: postings filter to the query vocabulary before the
    explode (as in BM25); collection frequencies are a |q|-row
    broadcast; the length adjustment is map-side over the (id, dl)
    projection; matched contributions fold per doc in term order
    (bit-reproducible), then one TakeOrderedAndProject.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    if mu <= 0:
        raise ValueError(f"mu must be > 0, got {mu}")
    terms = [t.lower() for t in query_terms]

    toks = docs.select(
        F.col(id_col),
        F.transform(word_tokens(text_col), lambda w: F.lower(w)).alias("__w"),
    )
    # lens feeds every consumer below (corpus constants + the length-
    # adjustment join) — unpinned, each consumer re-ran the full-corpus
    # tokenize (round 12, guide §2.4). The checkpoint is a NARROW
    # (id, dl) frame: 16 bytes/row even at 100 TB.
    lens = toks.select(
        F.col(id_col), F.size("__w").cast("long").alias("dl")
    ).localCheckpoint(eager=False)
    consts = lens.agg(F.sum("dl").cast("long").alias("sum_dl"))
    tf = (
        toks.select(
            F.col(id_col),
            F.explode(
                F.filter(F.col("__w"), lambda w: w.isin(terms))
            ).alias("term"),
        )
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    cf = tf.groupBy("term").agg(F.sum("tf").cast("long").alias("cf"))
    nq = cf.agg(F.count(F.lit(1)).cast("long").alias("n_terms"))
    # matched contributions: ln(1 + tf / (mu * cf / sum_dl))
    contrib = F.log(
        F.lit(1.0)
        + F.col("tf").cast("double")
        / (
            F.lit(float(mu))
            * F.col("cf").cast("double")
            / F.col("sum_dl").cast("double")
        )
    )
    matched = (
        tf.join(broadcast(cf), "term")
        .crossJoin(broadcast(consts))
        .select(
            F.col(id_col), F.struct(F.col("term"), contrib.alias("c")).alias("tc")
        )
        .groupBy(id_col)
        .agg(
            F.aggregate(
                F.array_sort(F.collect_list("tc")),
                F.lit(0.0),
                lambda acc, x: acc + x["c"],
            ).alias("__m")
        )
    )
    adj = F.col("n_terms").cast("double") * F.log(
        F.lit(float(mu)) / (F.col("dl").cast("double") + F.lit(float(mu)))
    )
    return (
        lens.join(matched, id_col, "left")
        .crossJoin(broadcast(nq))
        .select(
            F.col(id_col),
            F.round(F.coalesce("__m", F.lit(0.0)) + adj, 4).alias("score"),
        )
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(top_n)
    )


def rm3_expanded_topk(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: list[str],
    mu: float = 2000.0,
    fb_docs: int = 10,
    fb_terms: int = 10,
    lam: float = 0.5,
    top_n: int = 20,
) -> DataFrame:
    """RM3 pseudo-relevance feedback (Abdul-Jaleel et al. 2004, the
    TREC-standard query expansion): run Dirichlet query likelihood
    once, treat the top ``fb_docs`` results as pseudo-relevant, build
    the relevance model

        p(w|R) = Σ_{d∈FB} softmax(score_d) · tf(w,d)/|d|

    interpolate with the original (uniform) query model,

        p'(w) = λ·qtf(w)/|q| + (1−λ)·p(w|R),

    keep the top ``fb_terms`` expansion terms, and re-score the corpus
    with the WEIGHTED query likelihood

        score(d) = Σ_t w_t·ln(1 + tf/(μ·p(t|C))) + (Σ_t w_t)·ln(μ/(|d|+μ)).

    Determinism: feedback docs and expansion terms pick by
    (value DESC, key ASC); the doc softmax is max-shifted; interpolated
    term weights quantize to e6 integers before the rescoring pass (the
    12-dp-resync discipline), so both passes replay exactly in SQL.
    Original query terms are retained unconditionally (p_rm1 = 0 when
    absent from every feedback doc — the standard RM3 convention, so
    lam = 1.0 reduces to the original query); query terms missing from
    the whole corpus still drop from pass 2 exactly as in
    `ql_dirichlet_topk`.

    Scale shape: pass 1 is `ql_dirichlet_topk`'s plan; the feedback set
    is a ``fb_docs``-row broadcast; RM1 touches only the feedback docs'
    postings; the expansion set is a ``fb_terms``-row broadcast; pass 2
    is the same vocabulary-filtered postings plan with per-term
    weights. Two corpus scans total — the price of feedback — and no
    shuffle wider than the (id, term) counting both passes share.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    if mu <= 0 or not 0.0 <= lam <= 1.0:
        raise ValueError(f"need mu > 0 and lam in [0,1], got {mu}, {lam}")
    if fb_docs < 1 or fb_terms < 1:
        raise ValueError(
            f"need fb_docs/fb_terms >= 1, got {fb_docs}/{fb_terms}"
        )
    terms = sorted({t.lower() for t in query_terms})

    toks = docs.select(
        F.col(id_col),
        F.transform(word_tokens(text_col), lambda w: F.lower(w)).alias("__w"),
    )
    # lens feeds every consumer below (corpus constants + the length-
    # adjustment join) — unpinned, each consumer re-ran the full-corpus
    # tokenize (round 12, guide §2.4). The checkpoint is a NARROW
    # (id, dl) frame: 16 bytes/row even at 100 TB.
    lens = toks.select(
        F.col(id_col), F.size("__w").cast("long").alias("dl")
    ).localCheckpoint(eager=False)
    consts = lens.agg(F.sum("dl").cast("long").alias("sum_dl"))

    def ql_scores(tweights: DataFrame | None) -> DataFrame:
        """(id, score). ``tweights=None``: the plain unit-weight QL of
        `ql_dirichlet_topk` over the literal query terms. Else a
        (term, w_e6) frame: each matched contribution scales by
        w_e6/1e6 and the length adjustment by the total weight of
        corpus-present terms."""
        if tweights is None:
            tfr = (
                toks.select(
                    F.col(id_col),
                    F.explode(
                        F.filter(F.col("__w"), lambda w: w.isin(terms))
                    ).alias("term"),
                )
                .groupBy(id_col, "term")
                .agg(F.count(F.lit(1)).cast("long").alias("tf"))
            )
            cf = tfr.groupBy("term").agg(
                F.sum("tf").cast("long").alias("cf")
            )
            wsum = cf.agg(F.count(F.lit(1)).cast("double").alias("w_total"))
            joined = tfr.join(broadcast(cf), "term")
            wcol = F.lit(1.0)
        else:
            qts = tweights.groupBy().agg(
                F.array_sort(F.collect_list("term")).alias("__qts")
            )
            tfr = (
                toks.crossJoin(broadcast(qts))
                .select(
                    F.col(id_col),
                    F.explode(
                        F.filter(
                            F.col("__w"),
                            lambda w: F.array_contains(F.col("__qts"), w),
                        )
                    ).alias("term"),
                )
                .groupBy(id_col, "term")
                .agg(F.count(F.lit(1)).cast("long").alias("tf"))
            )
            cf = tfr.groupBy("term").agg(
                F.sum("tf").cast("long").alias("cf")
            )
            wsum = cf.join(broadcast(tweights), "term").agg(
                (F.sum("w_e6").cast("double") / F.lit(1e6)).alias("w_total")
            )
            joined = tfr.join(broadcast(cf), "term").join(
                broadcast(tweights), "term"
            )
            wcol = F.col("w_e6").cast("double") / F.lit(1e6)
        contrib = wcol * F.log(
            F.lit(1.0)
            + F.col("tf").cast("double")
            / (
                F.lit(float(mu))
                * F.col("cf").cast("double")
                / F.col("sum_dl").cast("double")
            )
        )
        matched = (
            joined.crossJoin(broadcast(consts))
            .select(
                F.col(id_col),
                F.struct(F.col("term"), contrib.alias("c")).alias("tc"),
            )
            .groupBy(id_col)
            .agg(
                F.aggregate(
                    F.array_sort(F.collect_list("tc")),
                    F.lit(0.0),
                    lambda acc, x: acc + x["c"],
                ).alias("m")
            )
        )
        return (
            lens.join(matched, id_col, "left")
            .crossJoin(broadcast(wsum))
            .select(
                F.col(id_col),
                (
                    F.coalesce("m", F.lit(0.0))
                    + F.col("w_total")
                    * F.log(
                        F.lit(float(mu))
                        / (F.col("dl").cast("double") + F.lit(float(mu)))
                    )
                ).alias("score"),
            )
        )

    # pass 1 + feedback set + softmax doc weights (fb_docs-row frames).
    # The fb frame feeds the softmax scalars, fb_info, and RM1 — pin it
    # (lazy localCheckpoint) or every consumer re-runs the full-corpus
    # QL pass (measured 8.1 s -> ~2 s at sf0.1).
    fb = (
        ql_scores(None)
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(int(fb_docs))
        .localCheckpoint(eager=False)
    )
    fbe = fb.crossJoin(broadcast(fb.agg(F.max("score").alias("__mx")))).select(
        F.col(id_col), F.exp(F.col("score") - F.col("__mx")).alias("__e")
    )
    fbw = fbe.crossJoin(
        broadcast(fbe.agg(F.sum("__e").alias("__se")))
    ).select(F.col(id_col), (F.col("__e") / F.col("__se")).alias("wd"))

    # RM1 over the feedback docs' full vocabularies (doc-ordered folds).
    # fb_info is the fb_docs-row (id, dl, wd) frame — THAT broadcasts,
    # never the corpus-sized lens projection.
    fb_info = fbw.join(lens, id_col)
    # tokenize AFTER the broadcast id join (round 12, guide §1.2): the
    # join only needs ids, but an upstream `toks.join(...)` evaluates
    # the tokenizer projection for EVERY corpus row before the join
    # filters it to the fb_docs survivors — a full-corpus tokenize pass
    # to keep ~10 docs. Joining `docs` first tokenizes only those rows;
    # identical tokens per surviving row.
    fb_tf = (
        docs.join(broadcast(fb_info.select(id_col)), id_col)
        .select(
            F.col(id_col),
            F.transform(word_tokens(text_col), lambda w: F.lower(w)).alias(
                "__w"
            ),
        )
        .select(F.col(id_col), F.explode_outer("__w").alias("term"))
        .where(F.col("term").isNotNull())
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    rm1 = (
        fb_tf.join(broadcast(fb_info), id_col)
        .select(
            "term",
            F.struct(
                F.col(id_col).alias("d"),
                (
                    F.col("wd")
                    * F.col("tf").cast("double")
                    / F.col("dl").cast("double")
                ).alias("p"),
            ).alias("dp"),
        )
        .groupBy("term")
        .agg(
            F.aggregate(
                F.array_sort(F.collect_list("dp")),
                F.lit(0.0),
                lambda acc, x: acc + x["p"],
            ).alias("p_rm1")
        )
    )
    # standard RM3 retains original query terms unconditionally: union
    # the query-term set in with p_rm1 = 0 (for terms absent from every
    # feedback doc) BEFORE the top-fb_terms cut, so at lam = 1.0 the
    # expansion reduces to the original query. sum over the ≤2 rows per
    # term is exact (x + 0.0); oracle mirrors the same union.
    qframe = docs.sparkSession.createDataFrame(
        [(t, 0.0) for t in terms], "term: string, p_rm1: double"
    )
    rm1 = (
        rm1.unionByName(qframe)
        .groupBy("term")
        .agg(F.sum("p_rm1").alias("p_rm1"))
    )
    p_orig = F.when(
        F.col("term").isin(terms), F.lit(1.0 / len(terms))
    ).otherwise(F.lit(0.0))
    expansion = (
        rm1.select(
            "term",
            (
                F.lit(float(lam)) * p_orig
                + F.lit(1.0 - float(lam)) * F.col("p_rm1")
            ).alias("p"),
        )
        .orderBy(F.desc("p"), F.asc("term"))
        .limit(int(fb_terms))
        .select("term", F.round(F.col("p") * 1e6).cast("long").alias("w_e6"))
        .where(F.col("w_e6") > 0)
        # the expansion frame feeds tf2, cf2, the weight total, and the
        # contribution join — pin the fb_terms-row result once
        .localCheckpoint(eager=False)
    )

    return (
        ql_scores(expansion)
        .select(F.col(id_col), F.round("score", 4).alias("score"))
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(int(top_n))
    )


def _proxy_token_emb(tok, emb_dim: int):
    """dim-``emb_dim`` md5 proxy embedding of a token Column — the
    `clustering.embedding_proxy` construction applied per token (real
    path: a token-embedding matrix behind the iterator pandas_udf
    boundary, SURVEY §4)."""
    from datas_spark.operators.scoring import hash_unit_interval

    return F.array(
        *[
            hash_unit_interval(F.concat(tok, F.lit(f"#emb{i}"))) - F.lit(0.5)
            for i in range(emb_dim)
        ]
    )


def maxsim_scores(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: list[str],
    emb_dim: int = 8,
    max_doc_tokens: int = 64,
) -> DataFrame:
    """Late-interaction (MaxSim) scoring — the ColBERT relevance
    operator (Khattab & Zaharia 2020):

        score(q, d) = Σ_{t ∈ q}  max_{w ∈ d}  cos(E(t), E(w))

    — per query token, the best-matching document token's cosine,
    summed. Token embeddings here are the deterministic md5 proxy
    (both sides of the cosine derive from md5 in Spark AND in the SQL
    twin, so the whole interaction matrix hash-checks); the real path
    swaps `_proxy_token_emb` for a served embedding matrix.

    Returns ``(id_col, maxsim double)`` for EVERY doc (rounded 6;
    docs with no tokens score 0). Map-only: one pass, per row
    |terms|·min(|d|, max_doc_tokens) cosines of ``emb_dim`` dims —
    cap ``max_doc_tokens`` (documented truncation, the ColBERT doc-
    length budget) bounds the fan. Term maxes fold in sorted-term
    order with init 0.0 (the cross-engine float discipline).
    """
    from datas_spark.functions.arrays import cosine_from_norms, l2_norm

    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    if emb_dim < 1 or max_doc_tokens < 1:
        raise ValueError(
            f"need emb_dim/max_doc_tokens >= 1, got {emb_dim}/{max_doc_tokens}"
        )
    terms = sorted({t.lower() for t in query_terms})
    # array_distinct AFTER the first-``max_doc_tokens`` budget slice:
    # MaxSim takes a per-term MAX over document tokens, which is
    # duplicate-invariant, so scoring each distinct token once is exact
    # — and every duplicate dropped saves its emb_dim proxy-md5 draws
    # and |terms| cosine folds (round 12, guide §1.2).
    toks = F.array_distinct(
        F.slice(
            F.filter(
                F.transform(word_tokens(text_col), lambda w: F.lower(w)),
                lambda w: F.length(w) > 0,
            ),
            1,
            max_doc_tokens,
        )
    )
    base = docs.select(F.col(id_col), toks.alias("__w"))
    # token embeddings materialize ONCE (inner transform), then the
    # outer transform binds each emb as a lambda var and pairs it with
    # its L2 norm — so the norm fold reads the bound array instead of
    # re-deriving the md5 proxy, and the per-(term, token) cosine
    # below pays ONE dot fold instead of three (`cosine_from_norms`,
    # bit-identical; the term-embedding side is a literal, so its norm
    # constant-folds at plan time).
    te = base.select(
        F.col(id_col),
        F.transform(
            F.transform(F.col("__w"), lambda w: _proxy_token_emb(w, emb_dim)),
            lambda e: F.struct(e.alias("e"), l2_norm(e).alias("n")),
        ).alias("__p"),
    )

    def _term_max(term: str):
        # closure factory — HOF lambdas must not bind loop vars via
        # default args (the default would receive the element-index
        # Column; see the repo-wide lesson in the verify recipe)
        temb = _proxy_token_emb(F.lit(term), emb_dim)
        tnorm = l2_norm(temb)
        return F.coalesce(
            F.array_max(
                F.transform(
                    F.col("__p"),
                    lambda p: cosine_from_norms(p["e"], temb, p["n"], tnorm),
                )
            ),
            F.lit(0.0),
        )

    maxes = [_term_max(t_) for t_ in terms]
    maxsim = F.aggregate(
        F.array(*maxes), F.lit(0.0), lambda acc, x: acc + x
    )
    return te.select(F.col(id_col), F.round(maxsim, 6).alias("maxsim"))


def maxsim_rerank_topk(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    recall_n: int = 50,
    top_n: int = 20,
    emb_dim: int = 8,
    max_doc_tokens: int = 64,
) -> DataFrame:
    """Two-stage late-interaction retrieval — the modern lexical →
    token-level pipeline: BM25 recalls ``recall_n`` candidates (cheap,
    corpus-wide), MaxSim re-scores ONLY those (expensive per doc,
    candidate-bounded), top ``top_n`` by (maxsim DESC, id ASC).

    Scale shape: stage 1 is `bm25_topk`'s plan (postings filtered to
    the query vocabulary before any explode); the ``recall_n``-row
    candidate frame broadcasts into a semi-join, so stage 2's token
    fan never touches the corpus. Returns ``(id_col, maxsim)``.
    """
    cand = bm25_topk(
        docs, id_col, text_col, query_terms, k1=k1, b=b, top_n=recall_n
    ).select(id_col)
    cdocs = docs.join(broadcast(cand), id_col, "left_semi")
    scored = maxsim_scores(
        cdocs, id_col, text_col, query_terms,
        emb_dim=emb_dim, max_doc_tokens=max_doc_tokens,
    )
    return scored.orderBy(F.desc("maxsim"), F.asc(id_col)).limit(int(top_n))


def maxsim_recall_sampled(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: list[str],
    exact_sample_n: int = 400,
    k1: float = 1.2,
    b: float = 0.75,
    recall_n: int = 50,
    top_n: int = 20,
    emb_dim: int = 8,
    max_doc_tokens: int = 64,
) -> DataFrame:
    """`maxsim_recall_report` with a SAMPLED exact arm (VERDICT r10
    #5): the full report's exact arm scores the WHOLE corpus with the
    token-interaction fold — the honest way to get the true top-n, and
    the suite's most expensive scan (7.6× across the sf decade). At
    100 TB you estimate instead: elect a deterministic
    ``exact_sample_n``-doc sub-corpus by ``(md5(id), id)`` order (the
    seedless uniform draw every engine reproduces — the Lloyd-init
    discipline) and run BOTH arms inside it — exact MaxSim over the
    sample vs the BM25-gated pipeline over the sample (BM25 idf/avgdl
    from the sample too, so the two arms see the same corpus).

    The sample-restricted recall is an unbiased estimate of the
    lexical gate's admission quality, and the interaction cost is now
    bounded by ``exact_sample_n`` — CONSTANT in corpus size; only the
    narrow (md5, id) top-k election scans the full corpus. Keep the
    full-corpus `maxsim_recall_report` for small sf / final sign-off.
    Returns the same one-row ``(n_exact, n_hit, recall_pct)``."""
    if exact_sample_n < 1:
        raise ValueError(f"exact_sample_n must be >= 1, got {exact_sample_n}")
    samp_ids = (
        docs.select(
            F.col(id_col),
            F.md5(F.col(id_col).cast("string")).alias("__h"),
        )
        .orderBy(F.col("__h").asc(), F.col(id_col).asc())
        .limit(int(exact_sample_n))
        .select(id_col)
    )
    sdocs = docs.join(broadcast(samp_ids), id_col, "left_semi")
    return maxsim_recall_report(
        sdocs, id_col, text_col, query_terms,
        k1=k1, b=b, recall_n=recall_n, top_n=top_n,
        emb_dim=emb_dim, max_doc_tokens=max_doc_tokens,
    )


def maxsim_recall_report(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    recall_n: int = 50,
    top_n: int = 20,
    emb_dim: int = 8,
    max_doc_tokens: int = 64,
) -> DataFrame:
    """Recall of the BM25-gated MaxSim top-k against EXACT MaxSim over
    the whole corpus (the `ann_recall_report` discipline: the
    approximation's quality is itself a hash-checked query). One row:
    ``(n_exact, n_hit, recall_pct)`` — how many of the true top
    ``top_n`` the two-stage pipeline kept."""
    # the full-corpus maxsim frame feeds BOTH top-k cuts, and each
    # top-k frame feeds two consumers (count + semi-join) — pin the
    # tiny cuts (and derive approx from the same scored frame, so the
    # corpus-wide token interaction runs ONCE, not three times)
    scored_all = maxsim_scores(
        docs, id_col, text_col, query_terms,
        emb_dim=emb_dim, max_doc_tokens=max_doc_tokens,
    ).localCheckpoint(eager=False)
    cand = bm25_topk(
        docs, id_col, text_col, query_terms, k1=k1, b=b, top_n=recall_n
    ).select(id_col)
    approx = (
        scored_all.join(broadcast(cand), id_col, "left_semi")
        .orderBy(F.desc("maxsim"), F.asc(id_col))
        .limit(int(top_n))
        .select(id_col)
        .localCheckpoint(eager=False)
    )
    exact = (
        scored_all.orderBy(F.desc("maxsim"), F.asc(id_col))
        .limit(int(top_n))
        .select(id_col)
        .localCheckpoint(eager=False)
    )
    hit = exact.join(broadcast(approx), id_col, "left_semi")
    return exact.agg(F.count(F.lit(1)).cast("long").alias("n_exact")).crossJoin(
        broadcast(hit.agg(F.count(F.lit(1)).cast("long").alias("n_hit")))
    ).select(
        "n_exact",
        "n_hit",
        F.round(
            F.col("n_hit").cast("double") / F.col("n_exact").cast("double") * 100,
            4,
        ).alias("recall_pct"),
    )
