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


def test_asof_join_duplicate_right_ts_deterministic(spark):
    left = spark.createDataFrame([(1, 10)], "id long, ts long")
    # three right rows share (key, ts=5): greatest payload struct wins
    right = spark.createDataFrame(
        [(1, 5, "b"), (1, 5, "c"), (1, 5, "a")], "id long, ts long, tag string"
    )
    for _ in range(3):
        rows = J.asof_join(left, right, "id", "ts", "ts").collect()
        assert len(rows) == 1 and rows[0].r_tag == "c"


def test_asof_join_validates_structure(spark):
    import pytest

    left = spark.createDataFrame([(1, 10, 1.0)], "id long, ts long, v double")
    right = spark.createDataFrame([(1, 5, "a")], "id long, ts long, tag string")
    # right frame with only the key column
    with pytest.raises(ValueError, match="non-key"):
        J.asof_join(left, right.select("id"), "id", "ts", "ts")
    # reserved internal names
    bad = right.withColumnRenamed("tag", "__p")
    with pytest.raises(ValueError, match="internals"):
        J.asof_join(left, bad, "id", "ts", "ts")
    # prefixed right column colliding with a left column
    lclash = left.withColumnRenamed("v", "r_tag")
    with pytest.raises(ValueError, match="collide"):
        J.asof_join(lclash, right, "id", "ts", "ts")


def _asof_skewed_frames(spark):
    from pyspark.sql import functions as F

    # one hot key (0) holding ~90% of rows, plus a handful of cold keys
    left = spark.range(2000).select(
        F.when(F.col("id") % 10 == 9, F.col("id") % 7 + 1)
        .otherwise(F.lit(0))
        .alias("k"),
        (F.col("id") * 3 + 1).alias("ts"),
        F.col("id").alias("lid"),
    )
    right = spark.range(500).select(
        F.when(F.col("id") % 10 == 9, F.col("id") % 7 + 1)
        .otherwise(F.lit(0))
        .alias("k"),
        (F.col("id") * 11).alias("ts"),
        (F.col("id") * 2).alias("rv"),
    )
    return left, right


def test_asof_join_salted_matches_unsalted(spark):
    left, right = _asof_skewed_frames(spark)
    plain = J.asof_join(left, right, "k", "ts", "ts")
    salted = J.asof_join(left, right, "k", "ts", "ts", salt_buckets=8)
    key = lambda r: (r.k, r.ts, r.lid)
    a = sorted(((key(r), r.r_ts, r.r_rv) for r in plain.collect()))
    b = sorted(((key(r), r.r_ts, r.r_rv) for r in salted.collect()))
    assert a == b and len(a) == 2000


def test_asof_join_salted_spreads_hot_key(spark):
    left, right = _asof_skewed_frames(spark)
    salted = J.asof_join(left, right, "k", "ts", "ts", salt_buckets=8)
    plan = salted._jdf.queryExecution().executedPlan().toString()
    # the main window pass partitions by (key, salt bucket), so the hot
    # key's rows land in up to 8 separate tasks instead of one
    assert "__bkt" in plan


def test_asof_join_salted_rejects_tiny_bucket_count(spark):
    import pytest

    left = spark.createDataFrame([(1, 10, 1.0)], "id long, ts long, v double")
    right = spark.createDataFrame([(1, 5, "a")], "id long, ts long, tag string")
    with pytest.raises(ValueError, match="salt_buckets"):
        J.asof_join(left, right, "id", "ts", "ts", salt_buckets=1).collect()


def test_interval_join_rejects_nan_and_inf_bucket_width(spark):
    import pytest

    df = spark.createDataFrame([(1, 1.0)], "a long, v double")
    ivals = df.selectExpr("a", "v lo", "v hi")
    for bad in (float("nan"), float("inf"), -1.0):
        with pytest.raises(ValueError, match="bucket_width"):
            J.interval_join(df, ivals, "v", "lo", "hi", bad)


def test_interval_join_drops_null_bounded_intervals(spark):
    points = spark.createDataFrame([(1, 5.0)], "pid long, v double")
    ivals = spark.createDataFrame(
        [(1, 4.0, 6.0), (2, None, 6.0), (3, 4.0, None), (4, None, None)],
        "iid long, lo double, hi double",
    )
    # NULL-bounded intervals drop silently (can't match any point) —
    # they must not trip the oversized-interval raise_error
    got = J.interval_join(points, ivals, "v", "lo", "hi", 1.0).collect()
    assert [r.iid for r in got] == [1]


def test_asof_join_salted_matches_unsalted_on_null_ts(spark):
    left = spark.createDataFrame(
        [(1, 10, 100), (1, None, 101), (1, 30, 102)],
        "k long, ts long, lid long",
    )
    right = spark.createDataFrame(
        [(1, 5, 7.0), (1, 25, 8.0)], "k long, ts long, rv double"
    )
    plain = {r.lid: (r.r_ts, r.r_rv) for r in
             J.asof_join(left, right, "k", "ts", "ts").collect()}
    salted = {r.lid: (r.r_ts, r.r_rv) for r in
              J.asof_join(left, right, "k", "ts", "ts", salt_buckets=4).collect()}
    assert plain == salted
    # the NULL-ts left row matches nothing (sorts before every right row)
    assert plain[101] == (None, None)
    assert plain[100] == (5, 7.0) and plain[102] == (25, 8.0)


def test_interval_join_caps_bucket_explosion(spark):
    import pytest
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    points = spark.createDataFrame([(1, 5.0)], "pid long, v double")
    wide = spark.createDataFrame([(1, 0.0, 1e9)], "iid long, lo double, hi double")
    with pytest.raises(SparkRuntimeException, match="interval_join"):
        J.interval_join(points, wide, "v", "lo", "hi", 1.0, max_buckets_per_interval=100).collect()
    # raising the cap (or the width) lets the same data through
    ok = J.interval_join(points, wide, "v", "lo", "hi", 1e9, max_buckets_per_interval=100)
    assert ok.count() == 1


# ---------------------------------------------------------------------------
# salted_equi_join
# ---------------------------------------------------------------------------

def test_salted_join_equals_plain_join_inner_and_left(spark):
    import pytest
    from datas_spark.operators.joins import salted_equi_join

    left = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "c"), (3, "d"), (1, "a")],  # dup row + hot key 1
        "k bigint, payload string",
    )
    right = spark.createDataFrame(
        [(1, 10.0), (2, 20.0)], "k bigint, val double"
    )
    for how in ("inner", "left"):
        plain = sorted(
            tuple(r) for r in left.join(right, "k", how).collect()
        )
        salted = sorted(
            tuple(r) for r in salted_equi_join(left, right, "k", 4, how).collect()
        )
        assert salted == plain, how
    with pytest.raises(ValueError):
        salted_equi_join(left, right, "k", 1)
    with pytest.raises(ValueError):
        salted_equi_join(left, right, "k", 4, how="right")


def test_salted_join_spreads_hot_key_over_buckets(spark):
    from pyspark.sql import functions as F
    from datas_spark.operators.joins import salted_equi_join

    # 100 distinct rows of one hot key must occupy >1 salt bucket
    left = spark.range(100).select(
        F.lit(7).alias("k"), F.col("id").alias("payload")
    )
    l = left.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(8))
    )
    n_buckets = l.select("__salt").distinct().count()
    assert n_buckets > 4
    # and the join still returns all 100 rows
    right = spark.createDataFrame([(7, "x")], "k bigint, tag string")
    assert salted_equi_join(left, right, "k", 8).count() == 100
