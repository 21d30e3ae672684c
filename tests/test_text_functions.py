"""Text/array function tests, including the reference's 3 canonical
alpaca examples (``/root/reference/src/pipeline/score_pipeline/
score_pipeline_ifd.py:237-253`` style fixtures)."""

import math

from pyspark.sql import functions as F

from datas_spark.functions import arrays as A
from datas_spark.functions import text as T

ALPACA_FIXTURES = [
    # mirrors the shape of the reference's inline smoke examples
    ("Give three tips for staying healthy.", "", "1. Eat a balanced diet..."),
    ("Identify the odd one out.", "Twitter, Instagram, Telegram", "Telegram"),
    ("Summarize the passage.", "", "The passage discusses..."),
]


def _alpaca_df(spark):
    return spark.createDataFrame(
        ALPACA_FIXTURES, "instruction string, input string, output string"
    )


def test_length_score(spark):
    df = _alpaca_df(spark)
    got = df.select(T.length_score("instruction").alias("s")).collect()
    assert [r.s for r in got] == [len(f[0]) for f in ALPACA_FIXTURES]


def test_alpaca_prompt_templates(spark):
    df = _alpaca_df(spark)
    rows = df.select(
        "instruction", "input", T.alpaca_prompt("instruction", "input").alias("p")
    ).collect()
    for r in rows:
        expected = (
            T.PROMPT_NO_INPUT.format(instruction=r.instruction)
            if r.input == ""
            else T.PROMPT_INPUT.format(instruction=r.instruction, input=r.input)
        )
        assert r.p == expected


def test_whole_and_answer_text(spark):
    df = _alpaca_df(spark)
    r = df.select(
        T.whole_text("instruction", "input", "output").alias("w"),
        T.direct_answer_text("output").alias("d"),
    ).first()
    assert r.w.endswith(ALPACA_FIXTURES[0][2])
    assert r.d == "### Response:" + ALPACA_FIXTURES[0][2]


def test_tokenize_splits_punctuation(spark):
    df = spark.createDataFrame([("Don't stop, now!",)], "t string")
    toks = df.select(T.tokenize("t").alias("x")).first().x
    assert toks == ["don", "'", "t", "stop", ",", "now", "!"]


def test_shingles(spark):
    df = spark.createDataFrame([("a b c d", ), ("a b", )], "t string")
    got = [r.s for r in df.select(T.shingles("t", 3).alias("s")).collect()]
    assert got[0] == ["a b c", "b c d"]
    assert got[1] == []  # shorter than n → empty, not bogus


def test_language_id(spark):
    df = spark.createDataFrame(
        [("the cat and the dog in the house",), ("der Hund ist ein Tier und nicht",)],
        "t string",
    )
    got = [r.g for r in df.select(T.language_id("t").alias("g")).collect()]
    assert got == ["en", "de"]


def test_array_math(spark):
    df = spark.createDataFrame([([1.0, 2.0, 3.0], [4.0, 5.0, 6.0])], "a array<double>, b array<double>")
    r = df.select(
        A.arr_mean("a").alias("m"),
        A.dot("a", "b").alias("d"),
        A.cosine_similarity("a", "b").alias("c"),
        A.l2_distance("a", "b").alias("l2"),
    ).first()
    assert r.m == 2.0
    assert r.d == 32.0
    assert math.isclose(r.c, 32.0 / (math.sqrt(14) * math.sqrt(77)))
    assert math.isclose(r.l2, math.sqrt(27))


def test_arr_mean_empty_is_null(spark):
    df = spark.createDataFrame([([],)], "a array<double>")
    assert df.select(A.arr_mean("a").alias("m")).first().m is None


def test_entropy_uniform_max(spark):
    df = spark.createDataFrame(
        [([0.25, 0.25, 0.25, 0.25],), ([1.0, 0.0, 0.0, 0.0],)], "p array<double>"
    )
    got = [r.e for r in df.select(A.entropy("p").alias("e")).collect()]
    assert got[0] > got[1]
    assert math.isclose(got[0], math.log(4), rel_tol=1e-6)
