"""BPE training: hand-checked merges, deterministic tie-breaks, early
stop, and application-side consistency."""

import pytest
from pyspark.sql import functions as F

from datas_spark.operators import bpe as BPE


def test_learn_merges_hand_example(spark):
    # 'low' x5, 'lower' x2: pair counts round 1 ->
    #   l o:7, o w:7, w e:2, e r:2  -> tie on 7 broken lexicographically: 'l o'
    df = spark.createDataFrame(
        [("low low low low low lower lower",)], "text: string"
    )
    got = [tuple(r) for r in BPE.learn_bpe_merges(df, "text", n_merges=3).collect()]
    assert got[0] == (1, "l o", "lo", 7)
    # round 2: 'lo w':7 dominates
    assert got[1] == (2, "lo w", "low", 7)
    # round 3: 'low e':2 vs 'e r':2 -> 'e r' ('e r' < 'low e')
    assert got[2] == (3, "e r", "er", 2)


def test_learn_merges_early_stop(spark):
    # every word unique chars, no pair repeats -> stop at once
    df = spark.createDataFrame([("ab cd ef",)], "text: string")
    # each pair occurs once (< 2) -> no merges at all
    assert BPE.learn_bpe_merges(df, "text", n_merges=5).count() == 0


def test_learn_merges_weighted_by_word_frequency(spark):
    # 'aa' appears 3x as a word; pair (a,a) count = 3 even though the
    # distinct-word table has it once
    df = spark.createDataFrame([("aa aa aa zz",)], "text: string")
    got = BPE.learn_bpe_merges(df, "text", n_merges=1).collect()
    assert (got[0]["pair"], got[0]["pair_count"]) == ("a a", 3)


def test_apply_matches_training_result(spark):
    """Applying the learned merge list with the literal replace chain
    must reproduce the symbol strings the trainer ended with."""
    df = spark.createDataFrame(
        [("banana bandana banana",), ("ban ban banana",)], "text: string"
    )
    merges_df = BPE.learn_bpe_merges(df, "text", n_merges=4)
    merges = [r["pair"] for r in merges_df.orderBy("step").collect()]
    assert len(merges) == 4

    rows = df.select(
        "text", BPE.apply_bpe_merges(F.col("text"), merges).alias("toks")
    ).collect()
    for r in rows:
        # merges only concatenate: tokens rejoin to the text sans spaces
        assert "".join(r["toks"]) == r["text"].replace(" ", "")
        # and the learned top merge actually shows up as a token
        assert any(merges[0].replace(" ", "") in t for t in r["toks"])

    counts = BPE.bpe_token_counts(
        df.select(F.monotonically_increasing_id().alias("id"), "text"),
        "id",
        "text",
        merges,
    ).collect()
    for r in counts:
        assert 0 < r["n_bpe_tokens"] <= r["n_chars"]


def test_token_counts_compress_vs_chars(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    merges_df = BPE.learn_bpe_merges(docs, "text", n_merges=6)
    merges = [r["pair"] for r in merges_df.orderBy("step").collect()]
    out = BPE.bpe_token_counts(docs, "doc_id", "text", merges)
    row = out.agg(
        F.sum("n_bpe_tokens").alias("t"), F.sum("n_chars").alias("c")
    ).collect()[0]
    # token count strictly below character count (merges + word split)
    assert 0 < row["t"] < row["c"]
    # more merges -> never more tokens
    merges2 = merges[:3]
    row2 = (
        BPE.bpe_token_counts(docs, "doc_id", "text", merges2)
        .agg(F.sum("n_bpe_tokens").alias("t"))
        .collect()[0]
    )
    assert row["t"] <= row2["t"]


def test_n_merges_validation(spark):
    df = spark.createDataFrame([("x",)], "text: string")
    with pytest.raises(ValueError):
        BPE.learn_bpe_merges(df, "text", n_merges=0)
