"""Unigram-LM tokenizer trainer (round 10, VERDICT r9 #7): the probs
form a distribution, EM likelihood is monotone, coverage/pruning rules
hold, and the fertility frame is consistent."""

import pytest

from datas_spark.operators.unigram import unigram_lm_learn


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "the cat sat on the mat"),
        (2, "the cat ate the rat"),
        (3, "mats and rats and cats and bats"),
        (4, "the the the cat cat mat"),
    ]
    return spark.createDataFrame(rows, ["id", "text"])


def test_unigram_probs_form_distribution_and_cover_alphabet(spark, corpus):
    vocab, ll, wp = unigram_lm_learn(corpus, "text", n_rounds=2, n_multi=12)
    rows = vocab.collect()
    assert abs(sum(r.prob for r in rows) - 1.0) < 1e-6
    assert all(r.cnt >= 1 and r.prob > 0 for r in rows)
    # every character of the corpus survives pruning (coverage floor)
    pieces = {r.piece for r in rows}
    alphabet = set("thecatsonmrdb")
    assert alphabet <= {p for p in pieces if len(p) == 1}
    # frequent whole words become pieces
    assert "the" in pieces and "cat" in pieces


def test_unigram_em_likelihood_is_monotone(spark, corpus):
    _, ll, _ = unigram_lm_learn(corpus, "text", n_rounds=4, n_multi=12)
    assert len(ll) == 4
    for a, b in zip(ll, ll[1:]):
        assert b >= a - 1e-9  # hard-EM: Viterbi LL never decreases


def test_unigram_fertility_frame_consistent(spark, corpus):
    vocab, _, wp = unigram_lm_learn(corpus, "text", n_rounds=2, n_multi=12)
    rows = wp.collect()
    # every word segments into >= 1 and <= len(word) pieces
    assert all(1 <= r.n_pieces <= len(r.word) for r in rows)
    # 'the' is a vocab piece, so the word 'the' segments as ONE piece
    got = {r.word: r.n_pieces for r in rows}
    assert got["the"] == 1


def test_unigram_validates_params(spark, corpus):
    with pytest.raises(ValueError):
        unigram_lm_learn(corpus, "text", n_rounds=0)
    with pytest.raises(ValueError):
        unigram_lm_learn(corpus, "text", max_piece_len=20, max_word_len=10)


def test_pack_sequences_unigram_prices_by_viterbi_pieces(spark):
    """Per-doc n_tokens equals the sum over its (truncated) words of
    the learned segmentation's piece counts; bins fill greedily under
    the budget; wordless docs price 0 and still get a bin."""
    from datas_spark.operators.unigram import (
        pack_sequences_unigram,
        unigram_lm_learn,
    )

    rows = [
        (1, "s", "hello hello world"),
        (2, "s", "hello world world world"),
        (3, "s", ""),
        (4, "t", "banana bandana"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    kw = dict(n_rounds=2, n_multi=8, max_word_len=12, max_piece_len=4)
    out = {r.doc_id: r for r in pack_sequences_unigram(
        df, "doc_id", "text", budget=6, shard_col="source", **kw
    ).collect()}
    _v, _ll, wp = unigram_lm_learn(df, "text", **kw)
    np = {r.word: r.n_pieces for r in wp.collect()}
    assert out[1].n_tokens == 2 * np["hello"] + np["world"]
    assert out[2].n_tokens == np["hello"] + 3 * np["world"]
    assert out[3].n_tokens == 0
    assert out[4].n_tokens == np["banana"] + np["bandana"]
    # greedy cumsum bins per shard: doc 1 starts bin 0; doc 2 starts at
    # floor(prev_cumsum / 6); shard 't' restarts at bin 0
    assert out[1].bin == 0 and out[4].bin == 0
    assert out[2].bin == out[1].n_tokens // 6
    import pytest as _pytest
    with _pytest.raises(ValueError):
        pack_sequences_unigram(df, "doc_id", "text", budget=0)


def test_segmentation_agreement_invariants(spark):
    """With no BPE merges every position is a BPE boundary, so the
    unigram cuts are a subset: recall == 1 and precision = weighted
    |B_uni|/|B_bpe|; with max_piece_len=1 the unigram side also cuts
    everywhere and agreement is perfect."""
    from datas_spark.operators.unigram import segmentation_agreement

    df = spark.createDataFrame(
        [(1, "banana band banana"), (2, "ana band")],
        "doc_id long, text string",
    )
    kw = dict(n_rounds=1, n_multi=8, max_word_len=12)
    r = segmentation_agreement(df, "text", merges=[], **kw).collect()[0]
    assert r.boundary_recall == 1.0
    assert 0.0 < r.boundary_precision <= 1.0
    assert 0.0 < r.boundary_f1 <= 1.0
    perfect = segmentation_agreement(
        df, "text", merges=[], max_piece_len=1, **kw
    ).collect()[0]
    assert perfect.boundary_precision == 1.0
    assert perfect.boundary_recall == 1.0
    assert perfect.boundary_f1 == 1.0
    assert perfect.exact_match_rate == 1.0
    assert perfect.n_words == 3  # banana, band, ana (all < 12 chars)
    assert perfect.total_cnt == 5
