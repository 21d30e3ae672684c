"""Scorer family unit tests mirroring the reference's 3 canonical
alpaca examples (score_pipeline_ifd.py:237-253) plus the IFD drop
filter, LP math, and the scores-map view."""

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from datas_spark.operators.scoring import (
    _md5_unit,
    fake_causal_lm_factory,
    ifd_from_losses,
    ifd_model_scorer,
    ifd_scorer_proxy,
    length_scorer,
    lp_score,
    make_model_scorer,
    make_token_loss_scorer,
    perplexity_scorer_proxy,
    reward_scorer_proxy,
    with_scores_map,
)

# the reference's canonical smoke examples (score_pipeline_ifd.py:237-253)
CANONICAL = [
    Row(instruction="Give three tips for staying healthy.", input="",
        output="1.Eat a balanced diet. 2.Exercise regularly. 3.Get enough sleep."),
    Row(instruction="What are the three primary colors?", input="",
        output="The three primary colors are red, blue, and yellow."),
    Row(instruction="Describe the structure of an atom.", input="",
        output="An atom is made up of a nucleus, which contains protons and neutrons."),
]


@pytest.fixture(scope="module")
def alpaca(spark):
    return spark.createDataFrame(CANONICAL)


def test_length_scorer(spark, alpaca):
    got = {r.instruction[:4]: r.lenth for r in length_scorer(alpaca).collect()}
    assert got["Give"] == len(CANONICAL[0].output)


def test_reward_and_ppl_proxies_deterministic(spark, alpaca):
    rw1 = {r.instruction: r.score_rw for r in reward_scorer_proxy(alpaca).collect()}
    rw2 = {r.instruction: r.score_rw for r in reward_scorer_proxy(alpaca).collect()}
    assert rw1 == rw2
    assert all(0.0 <= v < 1.0 for v in rw1.values())
    ppl = {r.instruction: r.ppl_ins_alone for r in perplexity_scorer_proxy(alpaca).collect()}
    assert all(1.0 <= v < 100.0 for v in ppl.values())


def test_ifd_drop_filter(spark):
    rows = [
        Row(id=1, lc=[0.5, 0.5], la=[1.0, 1.0]),   # ratio 0.5 -> kept
        Row(id=2, lc=[2.0], la=[1.0]),              # ratio 2.0 -> dropped (>1)
        Row(id=3, lc=[], la=[1.0]),                 # empty -> NULL -> dropped
    ]
    df = spark.createDataFrame(rows)
    got = ifd_from_losses(df, "lc", "la").collect()
    assert [r.id for r in got] == [1]
    assert math.isclose(got[0].score_ifd, 0.5)


def test_ifd_proxy_composition(spark, alpaca):
    out = ifd_scorer_proxy(alpaca)
    for r in out.collect():
        assert r.score_ifd <= 1.0  # the mean_rate>1 drop (ifd.py:199-204)


def test_lp_score_null_denominator(spark):
    df = spark.createDataFrame([Row(id=1, p0=10.0, p1=8.0, pn=4.0),
                                Row(id=2, p0=5.0, p1=9.0, pn=5.0)])
    got = {r.id: r.score_lp for r in lp_score(df, ["p0", "p1", "pn"]).collect()}
    assert math.isclose(got[1], (8.0 - 10.0) / (10.0 - 4.0))
    assert got[2] is None  # P0 == Pn -> undefined, not a crash


def test_scores_map_view(spark, alpaca):
    scored = with_scores_map(length_scorer(alpaca), ["lenth"])
    first = scored.first()
    assert first.scores == {"lenth": float(first.lenth)}


def test_make_model_scorer_loads_once_per_worker(spark, alpaca):
    calls = []

    def factory():
        calls.append(1)  # executor-side; list stays empty on driver
        return lambda s: s.str.len().astype("float64")

    scorer = make_model_scorer(factory)
    out = alpaca.withColumn("s", scorer(F.col("output"))).collect()
    assert all(r.s == float(len(r.output)) for r in out)
    assert calls == []  # factory ran on workers, not the driver


def test_token_loss_scorer_matches_direct_model_call(spark, alpaca):
    scorer = make_token_loss_scorer(fake_causal_lm_factory)
    out = alpaca.withColumn(
        "losses", scorer(F.col("instruction"), F.col("output"))
    ).collect()
    model = fake_causal_lm_factory()
    for r in out:
        assert r.losses == pytest.approx(model(r.instruction, r.output))
        assert len(r.losses) == len(r.output.split())


def test_ifd_model_scorer_e2e(spark, alpaca):
    # full P6+P8 through the pandas_udf model boundary: conditional
    # loss, alone loss, ratio, drop filter — checked against a plain
    # Python reimplementation of the fake model math
    got = {r.instruction: r.score_ifd for r in ifd_model_scorer(alpaca).collect()}
    from datas_spark.functions.text import PROMPT_NO_INPUT

    model = fake_causal_lm_factory()
    for row in CANONICAL:
        prompt = PROMPT_NO_INPUT.format(instruction=row.instruction)
        lc, la = model(prompt, row.output), model("", row.output)
        ratio = (sum(lc) / len(lc)) / (sum(la) / len(la))
        if ratio <= 1.0:
            assert got[row.instruction] == pytest.approx(ratio)
        else:
            assert row.instruction not in got


def test_grad_capture_long_layout_and_determinism(spark):
    from datas_spark.operators.scoring import grad_capture_long

    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma")], "doc_id long, text string"
    )
    params = ["l0", "l1", "l2"]
    out = grad_capture_long(docs, "doc_id", "text", params, dim=2)
    rows = out.collect()
    # every (id, param, idx) cell exactly once
    assert len(rows) == 2 * 3 * 2
    cells = {(r.doc_id, r.param, r.idx) for r in rows}
    assert len(cells) == len(rows)
    assert {r.param for r in rows} == set(params)
    assert {r.idx for r in rows} == {0, 1}
    # values are in (-1, 1) and bit-stable across runs
    assert all(-1.0 <= r.value <= 1.0 for r in rows)
    again = {(r.doc_id, r.param, r.idx): r.value for r in out.collect()}
    assert all(again[(r.doc_id, r.param, r.idx)] == r.value for r in rows)


def test_less_influence_matches_manual_dot_product(spark):
    import hashlib

    from datas_spark.operators.scoring import grad_capture_long, less_influence

    def unit(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16) / 2**32

    texts = {1: "alpha beta", 2: "gamma delta", 3: "epsilon"}
    docs = spark.createDataFrame(
        [(k, v) for k, v in texts.items()], "doc_id long, text string"
    )
    params, dim = ["l0", "l1"], 3
    grads = grad_capture_long(docs, "doc_id", "text", params, dim)
    target = grads.where("doc_id = 1")
    got = {
        r.doc_id: r.less_influence
        for r in less_influence(grads, target, "doc_id").collect()
    }

    def gvec(text):
        return [
            2.0 * unit(f"{text}#{p}#{j}") - 1.0 for p in params for j in range(dim)
        ]

    tv = gvec(texts[1])  # single target example -> avg == itself
    for did, text in texts.items():
        want = round(sum(a * b for a, b in zip(gvec(text), tv)), 6)
        assert abs(got[did] - want) < 1e-9
    # the target example is maximally aligned with its own gradient
    assert got[1] == max(got.values())
