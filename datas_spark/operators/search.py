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

__all__ = ["bm25_topk", "rrf_fuse", "ql_dirichlet_topk"]


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
    lens = toks.select(F.col(id_col), F.size("__w").cast("long").alias("dl"))
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
    lens = toks.select(F.col(id_col), F.size("__w").cast("long").alias("dl"))
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
