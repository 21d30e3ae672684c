"""BM25 ranking semantics."""

import pytest

from datas_spark.operators.search import bm25_topk


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "spark spark spark shuffle join"),          # heavy on rare terms
        (2, "spark is a data engine for data work"),
        (3, "completely unrelated text about cats"),
        (4, "join join join join join join join join"), # term spam, longer doc
        (5, "spark join"),                              # short, both terms
    ]
    return spark.createDataFrame(rows, "doc_id: long, text: string")


def test_bm25_ranks_matching_docs(corpus):
    got = bm25_topk(corpus, "doc_id", "text", ["spark", "join"], top_n=10).collect()
    ids = [r["doc_id"] for r in got]
    assert 3 not in ids            # no query terms -> not retrieved
    assert set(ids) == {1, 2, 4, 5}
    # doc 5 (short, both terms) must beat doc 2 (one term, diluted)
    score = {r["doc_id"]: r["score"] for r in got}
    assert score[5] > score[2]
    # scores are positive and sorted
    assert all(s > 0 for s in score.values())
    assert [r["score"] for r in got] == sorted((r["score"] for r in got), reverse=True)


def test_bm25_tf_saturation(corpus):
    """k1 saturation: 8x term spam must not score 8x a single hit."""
    got = {r["doc_id"]: r["score"] for r in bm25_topk(
        corpus, "doc_id", "text", ["join"], top_n=10
    ).collect()}
    assert got[4] < 3 * got[5]


def test_bm25_case_insensitive(spark):
    df = spark.createDataFrame([(1, "SPARK Join DATA")], "doc_id: long, text: string")
    got = bm25_topk(df, "doc_id", "text", ["Spark", "data"], top_n=5).collect()
    assert len(got) == 1 and got[0]["score"] > 0


def test_bm25_validation(corpus):
    with pytest.raises(ValueError):
        bm25_topk(corpus, "doc_id", "text", [])


def test_ql_dirichlet_prefers_term_dense_docs_and_penalizes_length(spark):
    """A doc with more query-term mass outranks a sparse one; between
    two docs with identical matches the SHORTER one wins (Dirichlet
    length normalization); corpus-absent query terms are dropped."""
    from datas_spark.operators.search import ql_dirichlet_topk

    docs = spark.createDataFrame(
        [
            (1, "data data join skew other other"),
            (2, "data other other other other other"),
            (3, "data data join skew " + "pad " * 50),
            (4, "nothing here at all"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.score for r in ql_dirichlet_topk(
        docs, "doc_id", "text", ["data", "join", "skew", "zzz_absent"],
        mu=100.0, top_n=10,
    ).collect()}
    assert len(out) == 4  # every doc scores under QL
    assert out[1] > out[2]      # more matched mass wins
    assert out[1] > out[3]      # same matches, shorter doc wins
    # doc 4 has no matches: worse than comparable-length matched docs
    # (but can outrank a LONG matched doc — length smoothing is real QL)
    assert out[4] < out[1] and out[4] < out[2]

    import pytest as _pytest

    with _pytest.raises(ValueError):
        ql_dirichlet_topk(docs, "doc_id", "text", [])
    with _pytest.raises(ValueError):
        ql_dirichlet_topk(docs, "doc_id", "text", ["data"], mu=0.0)


def test_lexical_rrf_fusion_rewards_agreement(spark):
    """A doc both scorers rank #1 must out-fuse docs only one list
    holds; ids in one list only still appear with n_lists == 1."""
    from datas_spark.operators.search import rrf_fuse

    a = spark.createDataFrame([(1, 1), (2, 2), (3, 3)], "doc_id long, rank int")
    b = spark.createDataFrame([(1, 1), (9, 2)], "doc_id long, rank int")
    out = {r.doc_id: r for r in rrf_fuse([a, b], "doc_id", k0=60, top_n=10).collect()}
    assert out[1].n_lists == 2 and out[9].n_lists == 1
    assert out[1].rrf_score > out[2].rrf_score > out[3].rrf_score
    assert out[1].rrf_score == round(2 / 61, 6)


@pytest.mark.slow
def test_rm3_lam1_preserves_plain_ql_ranking(spark):
    """lam=1 puts all interpolation mass on the original query, so the
    expansion set collapses to the original terms with uniform weights
    — the second pass must rank exactly like plain QL (scores scale by
    the 1/|q| weight, order unchanged)."""
    from datas_spark.operators.search import ql_dirichlet_topk, rm3_expanded_topk

    rows = [
        (1, "data join skew data"),
        (2, "data join other words here"),
        (3, "skew skew data join join"),
        (4, "completely unrelated text block"),
        (5, "data data data join skew skew"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    plain = [r.doc_id for r in ql_dirichlet_topk(
        docs, "doc_id", "text", ["data", "join", "skew"], mu=100.0, top_n=5
    ).collect()]
    rm3 = [r.doc_id for r in rm3_expanded_topk(
        docs, "doc_id", "text", ["data", "join", "skew"], mu=100.0,
        fb_docs=3, fb_terms=3, lam=1.0, top_n=5
    ).collect()]
    assert rm3 == plain


@pytest.mark.slow
def test_rm3_retains_query_term_absent_from_feedback_docs(spark):
    """Round-9 ADVICE: a query term present in the corpus but absent
    from every feedback doc must survive interpolation (p_rm1 = 0, not
    dropped) — at lam=1 the expansion is exactly the original query, so
    RM3 must rank like plain QL even when 'skew' lives only in a
    low-ranked doc outside the fb_docs=2 window."""
    from datas_spark.operators.search import ql_dirichlet_topk, rm3_expanded_topk

    rows = [
        (1, "data join data join data join"),   # fb doc 1 — no 'skew'
        (2, "data data join join data join"),   # fb doc 2 — no 'skew'
        (3, "skew other words entirely"),        # only corpus home of 'skew'
        (4, "unrelated filler text block"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    plain = [r.doc_id for r in ql_dirichlet_topk(
        docs, "doc_id", "text", ["data", "join", "skew"], mu=100.0, top_n=4
    ).collect()]
    rm3 = [r.doc_id for r in rm3_expanded_topk(
        docs, "doc_id", "text", ["data", "join", "skew"], mu=100.0,
        fb_docs=2, fb_terms=3, lam=1.0, top_n=4
    ).collect()]
    assert rm3 == plain


def test_rm3_expansion_pulls_cooccurring_terms(spark):
    """'umbrella' never appears in the query but dominates the top
    feedback docs; with lam=0 the expansion must include it, lifting a
    doc that contains ONLY 'umbrella' above one with no overlap."""
    from datas_spark.operators.search import rm3_expanded_topk

    rows = [
        (1, "data join skew umbrella umbrella"),
        (2, "data join umbrella umbrella skew"),
        (3, "umbrella umbrella umbrella parade"),   # no query terms
        (4, "nothing relevant whatsoever here"),
        (5, "data join skew plain"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r.score for r in rm3_expanded_topk(
        docs, "doc_id", "text", ["data", "join", "skew"], mu=100.0,
        fb_docs=2, fb_terms=5, lam=0.0, top_n=5
    ).collect()}
    assert out[3] > out[4]  # umbrella-only doc outranks the no-overlap doc


def test_rm3_validates_params(spark):
    import pytest as _pytest

    from datas_spark.operators.search import rm3_expanded_topk

    docs = spark.createDataFrame([(1, "a")], ["doc_id", "text"])
    with _pytest.raises(ValueError):
        rm3_expanded_topk(docs, "doc_id", "text", [])
    with _pytest.raises(ValueError):
        rm3_expanded_topk(docs, "doc_id", "text", ["a"], lam=1.5)
    with _pytest.raises(ValueError):
        rm3_expanded_topk(docs, "doc_id", "text", ["a"], fb_docs=0)


# ---------------------------------------------------------------------------
# round 10: late-interaction (MaxSim) rerank tier
# ---------------------------------------------------------------------------


def test_maxsim_exact_token_match_dominates(spark):
    """A doc containing every query token verbatim scores ~|q| (each
    term's best cosine is cos(e(t), e(t)) = 1); a doc with none of
    them scores strictly less; empty docs score 0."""
    from datas_spark.operators.search import maxsim_scores

    rows = [
        (1, "data join skew and more words"),
        (2, "completely unrelated tokens here"),
        (3, "   "),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r.doc_id: r.maxsim for r in maxsim_scores(
        docs, "doc_id", "text", ["data", "join", "skew"]).collect()}
    assert abs(got[1] - 3.0) < 1e-6  # three perfect matches
    assert got[2] < got[1]
    assert got[3] == 0.0


def test_maxsim_rerank_stays_within_bm25_candidates(spark):
    """The rerank's output set must be a subset of the BM25 recall
    stage (the gate is real), ordered by maxsim desc."""
    from datas_spark.operators.search import bm25_topk, maxsim_rerank_topk

    rows = [(i, f"data join skew filler{i % 5} pad{i}") for i in range(30)]
    rows += [(100 + i, "nothing relevant at all") for i in range(5)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    cand = {r.doc_id for r in bm25_topk(
        docs, "doc_id", "text", ["data", "join", "skew"], top_n=10).collect()}
    out = maxsim_rerank_topk(
        docs, "doc_id", "text", ["data", "join", "skew"],
        recall_n=10, top_n=5).collect()
    assert len(out) == 5
    assert {r.doc_id for r in out} <= cand
    sims = [r.maxsim for r in out]
    assert sims == sorted(sims, reverse=True)


def test_maxsim_recall_report_bounds_and_validation(spark):
    """recall_pct in [0, 100]; with recall_n covering the whole corpus
    the gate is a no-op and recall is exactly 100."""
    import pytest as _pytest

    from datas_spark.operators.search import maxsim_recall_report, maxsim_scores

    rows = [(i, f"data join skew word{i % 7} tail{i}") for i in range(25)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    r = maxsim_recall_report(
        docs, "doc_id", "text", ["data", "join", "skew"],
        recall_n=25, top_n=10).collect()[0]
    assert r.n_exact == 10 and r.n_hit == 10 and r.recall_pct == 100.0
    with _pytest.raises(ValueError):
        maxsim_scores(docs, "doc_id", "text", [])
    with _pytest.raises(ValueError):
        maxsim_scores(docs, "doc_id", "text", ["a"], emb_dim=0)


@pytest.mark.slow
def test_maxsim_recall_sampled_restricts_both_arms(spark):
    """The sampled report equals the full report computed on the
    md5-elected sub-corpus (sample covering everything -> identical to
    the full report), and a proper sub-sample bounds n_exact by
    min(top_n, sample size)."""
    import pytest as _pytest

    from datas_spark.operators.search import (
        maxsim_recall_report,
        maxsim_recall_sampled,
    )

    rows = [(i, f"data join skew word{i % 7} tail{i}") for i in range(25)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    kw = dict(k1=1.2, b=0.75, recall_n=5, top_n=10)
    full = maxsim_recall_report(
        docs, "doc_id", "text", ["data", "join", "skew"], **kw
    ).collect()[0]
    covering = maxsim_recall_sampled(
        docs, "doc_id", "text", ["data", "join", "skew"],
        exact_sample_n=100, **kw
    ).collect()[0]
    assert (covering.n_exact, covering.n_hit, covering.recall_pct) == (
        full.n_exact, full.n_hit, full.recall_pct
    )
    small = maxsim_recall_sampled(
        docs, "doc_id", "text", ["data", "join", "skew"],
        exact_sample_n=6, **kw
    ).collect()[0]
    assert small.n_exact == 6  # top_n capped by the 6-doc sample
    assert 0 <= small.n_hit <= small.n_exact
    with _pytest.raises(ValueError):
        maxsim_recall_sampled(docs, "doc_id", "text", ["a"], exact_sample_n=0)
