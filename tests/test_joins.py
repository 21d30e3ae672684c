"""Unit tests for temporal/interval join operators."""

from pyspark.sql import functions as F

from datas_spark.operators import joins as J


def test_asof_join_backward_inclusive(spark):
    left = spark.createDataFrame(
        [(1, 10, 100.0), (1, 20, 200.0), (2, 15, 150.0), (3, 5, 50.0)],
        "id long, ts long, value double",
    )
    right = spark.createDataFrame(
        [(1, 10, "a"), (1, 15, "b"), (2, 16, "c")],
        "id long, ts long, tag string",
    )
    rows = {
        (r.id, r.ts): (r.r_ts, r.r_tag)
        for r in J.asof_join(left, right, "id", "ts", "ts").collect()
    }
    # equal timestamps match (inclusive)
    assert rows[(1, 10)] == (10, "a")
    # latest prior row wins, not just any prior row
    assert rows[(1, 20)] == (15, "b")
    # right row strictly after the left row does not match
    assert rows[(2, 15)] == (None, None)
    # key with no right rows at all -> NULLs (left outer)
    assert rows[(3, 5)] == (None, None)


def test_asof_join_keeps_left_row_count(spark):
    left = spark.range(100).select(
        (F.col("id") % 7).alias("k"), F.col("id").alias("ts")
    )
    right = spark.range(30).select(
        (F.col("id") % 7).alias("k"), (F.col("id") * 3).alias("ts")
    )
    out = J.asof_join(left, right, "k", "ts", "ts")
    assert out.count() == 100


def test_interval_join_matches_theta_join(spark):
    points = spark.createDataFrame(
        [(i, float(i)) for i in range(0, 50)], "pid long, v double"
    )
    # overlapping intervals, widths straddling the bucket width
    ivals = spark.createDataFrame(
        [(1, 0.0, 9.0), (2, 5.0, 30.0), (3, 29.5, 29.9), (4, 45.0, 60.0)],
        "iid long, lo double, hi double",
    )
    got = sorted(
        (r.pid, r.iid)
        for r in J.interval_join(points, ivals, "v", "lo", "hi", bucket_width=8.0).collect()
    )
    want = sorted(
        (r.pid, r.iid)
        for r in points.join(
            ivals, (F.col("v") >= F.col("lo")) & (F.col("v") <= F.col("hi"))
        ).collect()
    )
    assert got == want and len(got) > 0


def test_interval_join_rejects_bad_bucket_width(spark):
    import pytest

    df = spark.createDataFrame([(1, 1.0)], "a long, v double")
    with pytest.raises(ValueError):
        J.interval_join(df, df.selectExpr("a", "v lo", "v hi"), "v", "lo", "hi", 0)
