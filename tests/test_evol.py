"""Evol-Instruct schedule surface (round 10, VERDICT r9 #3): method
election determinism, prompt chaining, and the rd_0..rd_N pool
bookkeeping that composes active_learning_round."""

import pytest

from datas_spark.operators.evol import (
    EVOL_METHODS,
    evol_prompt,
    evol_prompt_schedule,
    evol_round_pools,
)
from pyspark.sql import functions as F


def test_evol_prompt_schedule_shape_and_chaining(spark):
    df = spark.createDataFrame(
        [(1, "sort a list"), (2, "write a poem")], "id long, ins string"
    )
    out = evol_prompt_schedule(df, "id", "ins", n_rounds=3).collect()
    assert len(out) == 6  # 2 rows x 3 rounds
    by = {(r.id, r.round): r for r in out}
    names = {n for n, _ in EVOL_METHODS}
    tmpl = dict(EVOL_METHODS)
    for (i, rnd), r in by.items():
        assert r.method in names
        assert r.prompt.startswith(tmpl[r.method])
    # round 1 wraps the raw instruction; round 2 wraps round 1's
    # marker-chained instruction
    r1, r2 = by[(1, 1)], by[(1, 2)]
    assert r1.prompt.endswith("sort a list")
    assert r2.prompt.endswith(f"[{r1.method}] sort a list")
    # deterministic: a fresh plan elects the same methods
    again = {(r.id, r.round): r.method
             for r in evol_prompt_schedule(df, "id", "ins", n_rounds=3).collect()}
    assert again == {k: v.method for k, v in by.items()}


def test_evol_prompt_single_constructor_and_validation(spark):
    df = spark.createDataFrame([("do x",)], "ins string")
    got = df.select(evol_prompt("ins", "reasoning").alias("p")).first().p
    assert got == dict(EVOL_METHODS)["reasoning"] + "do x"
    with pytest.raises(ValueError):
        evol_prompt("ins", "nope")
    with pytest.raises(ValueError):
        evol_prompt_schedule(df, "ins", "ins", n_rounds=0)


def test_evol_round_pools_bookkeeping(spark):
    """rd_0 = seed; each round promotes exactly k most-uncertain from
    the anti-join remainder; promoted rows never re-promote; the final
    unlabeled pool is the corpus minus all rounds (main.py:37-52)."""
    rows = [(i, float(100 - i)) for i in range(20)]  # conf desc = id asc
    df = spark.createDataFrame(rows, "id long, conf double")
    pools = evol_round_pools(
        df, "id", "conf", k=3, n_rounds=2, seed_pred=F.col("id") < 2
    )
    got = {r.id: r.rd for r in pools.collect()}
    assert {i for i, rd in got.items() if rd == 0} == {0, 1}
    # round 1: highest conf among unlabeled = ids 2,3,4; round 2: 5,6,7
    assert {i for i, rd in got.items() if rd == 1} == {2, 3, 4}
    assert {i for i, rd in got.items() if rd == 2} == {5, 6, 7}
    assert len(got) == 8
    unlabeled = df.join(pools, "id", "left_anti")
    assert unlabeled.count() == 12
