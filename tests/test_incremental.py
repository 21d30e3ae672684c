"""Incremental rollup maintenance: merge == full recompute (exactly),
merge associativity, disjoint-group passthrough."""

import pytest
from pyspark.sql import functions as F

from datas_spark.operators import incremental as INC


@pytest.fixture(scope="module")
def ev(spark, sf_dir):
    return (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("event_type", "value")
    )


def _as_set(df):
    return {tuple(r) for r in df.collect()}


def test_merge_equals_full_recompute(spark, ev):
    full = INC.partial_rollup(ev, ["event_type"], "value")
    a = INC.partial_rollup(ev.limit(0), ["event_type"], "value")  # empty side
    # split by a value predicate (disjoint, covering)
    lo = ev.where("value < 50")
    hi = ev.where("value >= 50 OR value IS NULL")
    merged = INC.merge_rollups(
        INC.partial_rollup(lo, ["event_type"], "value"),
        INC.partial_rollup(hi, ["event_type"], "value"),
        ["event_type"],
    )
    assert _as_set(merged) == _as_set(full)
    # empty delta is the identity
    assert _as_set(INC.merge_rollups(full, a, ["event_type"])) == _as_set(full)


def test_merge_associative(spark, ev):
    parts = [
        INC.partial_rollup(ev.where(f"abs(hash(value)) % 3 = {i}"), ["event_type"], "value")
        for i in range(3)
    ]
    left = INC.merge_rollups(INC.merge_rollups(parts[0], parts[1], ["event_type"]), parts[2], ["event_type"])
    right = INC.merge_rollups(parts[0], INC.merge_rollups(parts[1], parts[2], ["event_type"]), ["event_type"])
    assert _as_set(left) == _as_set(right)


def test_finalize_mean(spark):
    df = spark.createDataFrame([("a", 1.0), ("a", 2.0), ("b", 10.0)], "k: string, v: double")
    out = INC.finalize_rollup(INC.partial_rollup(df, ["k"], "v"))
    got = {r["k"]: (r["cnt"], float(r["sum_val"]), r["avg_val"]) for r in out.collect()}
    assert got["a"] == (2, 3.0, 1.5)
    assert got["b"] == (1, 10.0, 10.0)


def test_disjoint_groups_pass_through(spark):
    a = INC.partial_rollup(
        spark.createDataFrame([("x", 1.0)], "k: string, v: double"), ["k"], "v"
    )
    b = INC.partial_rollup(
        spark.createDataFrame([("y", 2.0)], "k: string, v: double"), ["k"], "v"
    )
    merged = INC.merge_rollups(a, b, ["k"])
    assert {r["k"] for r in merged.collect()} == {"x", "y"}


def test_ivm_join_delta_append_equals_recompute(spark):
    from datas_spark.operators.incremental import ivm_join_delta

    a_old = spark.createDataFrame([(1, "a1"), (2, "a2")], "k long, av string")
    a_new = spark.createDataFrame([(2, "a2b"), (3, "a3")], "k long, av string")
    b_old = spark.createDataFrame([(1, 10), (2, 20), (9, 90)], "k long, bv long")
    b_new = spark.createDataFrame([(2, 21), (3, 30)], "k long, bv long")

    old_view = a_old.join(b_old, ["k"])
    delta = ivm_join_delta(a_old, a_new, b_old, b_new, ["k"])
    appended = old_view.unionByName(delta)
    full = a_old.unionByName(a_new).join(b_old.unionByName(b_new), ["k"])
    key = lambda df: sorted(tuple(r) for r in df.collect())
    assert key(appended) == key(full)
    # the delta never re-emits pre-existing view rows
    assert all(t not in key(old_view) for t in key(delta))


def test_ivm_join_delta_empty_deltas_are_empty(spark):
    from datas_spark.operators.incremental import ivm_join_delta

    a = spark.createDataFrame([(1, "x")], "k long, av string")
    b = spark.createDataFrame([(1, 5)], "k long, bv long")
    empty_a = a.limit(0)
    empty_b = b.limit(0)
    assert ivm_join_delta(a, empty_a, b, empty_b, ["k"]).count() == 0
