import math

import pytest
from pyspark.sql import functions as F

from datas_spark.operators import encoding as E


def test_loo_target_encode_hand_example(spark):
    # cat a: targets 10, 20, 30 (sum 60, cnt 3); cat b: 40 (singleton)
    df = spark.createDataFrame(
        [("a", 10.0), ("a", 20.0), ("a", 30.0), ("b", 40.0)], ["cat", "y"]
    )
    out = {
        (r.cat, r.y): r.te
        for r in E.loo_target_encode(df, "cat", "y", smoothing=2.0).collect()
    }
    prior = 100.0 / 4
    assert out[("a", 10.0)] == pytest.approx((60 - 10 + 2 * prior) / (3 - 1 + 2))
    assert out[("a", 30.0)] == pytest.approx((60 - 30 + 2 * prior) / (3 - 1 + 2))
    # singleton: (m*prior)/m = prior exactly — no self-leakage possible
    assert out[("b", 40.0)] == pytest.approx(prior)


def test_loo_target_encode_own_label_never_leaks(spark):
    # two rows in one category with wildly different targets: if the row's
    # own y leaked, its encoding would move with it; LOO means each row's
    # encoding equals the OTHER row's value (smoothing 0 keeps it pure)
    df = spark.createDataFrame([("a", 0.0), ("a", 1000.0)], ["cat", "y"])
    out = {r.y: r.te for r in E.loo_target_encode(df, "cat", "y", smoothing=0.0).collect()}
    assert out[0.0] == pytest.approx(1000.0)
    assert out[1000.0] == pytest.approx(0.0)


def test_loo_target_encode_null_target_gets_blind_encoding(spark):
    df = spark.createDataFrame(
        [("a", 10.0), ("a", 30.0), ("a", None)], ["cat", "y"]
    )
    out = E.loo_target_encode(df, "cat", "y", smoothing=1.0).collect()
    prior = 20.0
    blind = (40 + 1 * prior) / (2 + 1)
    got = [r.te for r in out if r.y is None]
    assert got == [pytest.approx(blind)]


def test_robust_scale_hand_example(spark):
    # group g: 1..5 → med 3, p25 2, p75 4, IQR 2; constant group → NULL
    rows = [("g", float(i)) for i in range(1, 6)] + [("c", 7.0), ("c", 7.0)]
    df = spark.createDataFrame(rows, ["k", "v"])
    out = E.robust_scale(df, "v", by="k")
    got = {(r.k, r.v): r.scaled for r in out.collect()}
    assert got[("g", 1.0)] == pytest.approx(-1.0)
    assert got[("g", 3.0)] == pytest.approx(0.0)
    assert got[("g", 5.0)] == pytest.approx(1.0)
    assert got[("c", 7.0)] is None


def test_robust_scale_global_and_null_passthrough(spark):
    df = spark.createDataFrame(
        [(float(i),) for i in range(1, 6)] + [(None,)], ["v"]
    )
    out = E.robust_scale(df, "v")
    got = sorted(
        (r.scaled for r in out.collect()),
        key=lambda x: (x is None, x if x is not None else 0.0),
    )
    assert got[0] == pytest.approx(-1.0)
    assert got[-1] is None
    assert len(got) == 6
