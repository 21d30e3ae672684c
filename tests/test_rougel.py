"""ROUGE-L novelty filter (round 10): LCS correctness, the
Self-Instruct admission rule, and edge handling."""

import pytest

from datas_spark.operators.rougel import rouge_l_novelty


def test_rouge_l_novelty_admission_rule(spark):
    pool = spark.createDataFrame(
        [(100, "write a poem about the sea"),
         (101, "sort a list of numbers in python")],
        ["id", "text"],
    )
    cands = spark.createDataFrame(
        [
            (1, "write a poem about the sea"),          # exact dup -> 1.0
            (2, "write a short poem about the sea"),    # near dup -> high
            (3, "explain general relativity simply"),   # novel
            (4, "   "),                                  # empty -> 0.0
        ],
        ["id", "text"],
    )
    out = {r.id: r for r in rouge_l_novelty(
        cands, pool, "id", "text", threshold=0.7).collect()}
    assert out[1].max_rouge_l == 1.0 and not out[1].keep
    # LCS('write a short poem about the sea' (7), 'write a poem about the sea' (6)) = 6
    assert abs(out[2].max_rouge_l - 2 * 6 / 13) < 1e-6 and not out[2].keep
    assert out[3].max_rouge_l < 0.4 and out[3].keep
    assert out[4].max_rouge_l == 0.0 and out[4].keep


def test_rouge_l_catches_reordering_ngrams_miss(spark):
    """Token reorderings keep a long common subsequence even when
    higher-order n-grams vanish — the reason Self-Instruct uses
    ROUGE-L, not n-gram overlap."""
    pool = spark.createDataFrame([(1, "a b c d e f")], ["id", "text"])
    cands = spark.createDataFrame([(1, "a b c x d e")], ["id", "text"])
    r = rouge_l_novelty(cands, pool, "id", "text").collect()[0]
    assert abs(r.max_rouge_l - 2 * 5 / 12) < 1e-6  # LCS = a b c d e


def test_rouge_l_truncation_and_validation(spark):
    pool = spark.createDataFrame([(1, "t1 t2 t3 t4 t5 t6")], ["id", "text"])
    cands = spark.createDataFrame(
        [(1, "t1 t2 t3 zz zz zz zz zz zz zz zz zz zz t4 t5 t6")],
        ["id", "text"],
    )
    # max_tokens=3 truncates the candidate to t1 t2 t3 and the ref to
    # t1 t2 t3 -> perfect match under the budget
    r = rouge_l_novelty(cands, pool, "id", "text", max_tokens=3).collect()[0]
    assert r.max_rouge_l == 1.0
    with pytest.raises(ValueError):
        rouge_l_novelty(cands, pool, "id", "text", threshold=0.0)
    with pytest.raises(ValueError):
        rouge_l_novelty(cands, pool, "id", "text", max_tokens=0)
