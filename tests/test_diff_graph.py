"""Snapshot diff classification + triangle enumeration."""

import pytest
from pyspark.sql import functions as F

from datas_spark.operators.dedup import triangle_list
from datas_spark.operators.diff import snapshot_diff


def test_snapshot_diff_classifies(spark):
    old = spark.createDataFrame(
        [(1, "same"), (2, "will change"), (3, "will vanish"), (5, None)],
        "id: long, payload: string",
    )
    new = spark.createDataFrame(
        [(1, "same"), (2, "changed!"), (4, "brand new"), (5, None)],
        "id: long, payload: string",
    )
    got = {r["id"]: r["change"] for r in snapshot_diff(old, new, ["id"], ["payload"]).collect()}
    assert got == {1: "unchanged", 2: "changed", 3: "removed", 4: "added", 5: "unchanged"}


def test_snapshot_diff_null_vs_value(spark):
    old = spark.createDataFrame([(1, None)], "id: long, v: string")
    new = spark.createDataFrame([(1, "x")], "id: long, v: string")
    assert snapshot_diff(old, new, ["id"], ["v"]).collect()[0]["change"] == "changed"


def test_snapshot_diff_validation(spark):
    df = spark.createDataFrame([(1, "a")], "id: long, v: string")
    with pytest.raises(ValueError):
        snapshot_diff(df, df, [], ["v"])


def test_triangle_list_enumerates_each_once(spark):
    # K4 on {1,2,3,4} has exactly 4 triangles; plus a dangling edge 4-5
    edges = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)] + [(4, 5)]
    e = spark.createDataFrame(edges, "id_a: long, id_b: long")
    got = sorted(tuple(r) for r in triangle_list(e).collect())
    assert got == [(1, 2, 3), (1, 2, 4), (1, 3, 4), (2, 3, 4)]


def test_triangle_list_chain_has_none(spark):
    e = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], "id_a: long, id_b: long")
    assert triangle_list(e).count() == 0
