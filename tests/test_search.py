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
