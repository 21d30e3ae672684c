"""Key-skew profiler: counts/shares, tie-breaks, NULL-as-group, and
the salt recommendation arithmetic."""

import pytest
from pyspark.sql import functions as F

from datas_spark.operators import profile as PROF


@pytest.fixture(scope="module")
def skewed(spark):
    rows = (
        [("hot",)] * 60 + [("warm",)] * 25 + [("a",)] * 5 + [("b",)] * 5
        + [(None,)] * 5
    )
    return spark.createDataFrame(rows, "k: string")


def test_heavy_keys_order_and_share(skewed):
    got = PROF.heavy_keys(skewed, "k", top_n=3).collect()
    assert [(r["key"], r["cnt"]) for r in got] == [
        ("hot", 60),
        ("warm", 25),
        (None, 5),  # 5-way tie: NULL sorts first (nulls-first key asc)
    ]
    assert got[0]["share_pct"] == 60.0
    assert got[1]["share_pct"] == 25.0


def test_heavy_keys_tie_break_is_key_order(skewed):
    got = PROF.heavy_keys(skewed, "k", top_n=5).collect()
    assert [r["key"] for r in got[2:]] == [None, "a", "b"]


def test_skew_stats_fields(skewed):
    r = PROF.skew_stats(skewed, "k", shuffle_partitions=10).collect()[0]
    assert r["total_rows"] == 100
    assert r["n_keys"] == 5
    assert r["max_cnt"] == 60
    assert r["avg_cnt"] == 20.0
    assert r["skew_ratio"] == 3.0
    # even share = 100/10 = 10 rows; hottest key needs ceil(60/10) = 6
    assert r["suggested_salt"] == 6


def test_skew_stats_uniform_suggests_no_salt(spark):
    df = spark.createDataFrame([(i % 50,) for i in range(1000)], "k: int")
    r = PROF.skew_stats(df, "k", shuffle_partitions=200).collect()[0]
    assert r["skew_ratio"] == 1.0
    # 20 rows/key vs 5-row even share -> salt 4 (many keys per
    # partition is the planner's job; salt only splits a single key)
    assert r["suggested_salt"] == 4


def test_heavy_keys_uses_take_ordered(skewed):
    plan = PROF.heavy_keys(skewed, "k", top_n=3)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_profile_on_real_events(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    top = PROF.heavy_keys(ev, "user_id", top_n=10)
    stats = PROF.skew_stats(ev, "user_id").collect()[0]
    rows = top.collect()
    assert len(rows) == 10
    assert rows[0]["cnt"] >= rows[-1]["cnt"]
    assert stats["total_rows"] == ev.count()
    assert abs(sum(r["share_pct"] for r in PROF.heavy_keys(ev, "user_id", top_n=10**6).collect()) - 100.0) < 0.2


# ---------------------------------------------------------------------------
# round 6: mutual information
# ---------------------------------------------------------------------------


def test_mutual_information_independent_and_determined(spark):
    import math

    from datas_spark.operators.profile import mutual_information

    # perfectly determined: b = f(a) -> mi == h_a == h_b
    rows = [("x", "p")] * 4 + [("y", "q")] * 4
    df = spark.createDataFrame(rows, "a string, b string")
    r = mutual_information(df, "a", "b").collect()[0]
    assert r["mi"] == r["h_a"] == r["h_b"] == round(math.log(2), 6)
    assert r["nmi"] == 1.0

    # independent uniform 2x2 -> mi == 0
    rows = [("x", "p"), ("x", "q"), ("y", "p"), ("y", "q")] * 3
    df = spark.createDataFrame(rows, "a string, b string")
    r = mutual_information(df, "a", "b").collect()[0]
    assert r["mi"] == 0.0
    assert r["nmi"] == 0.0


def test_mutual_information_constant_column_null_nmi(spark):
    from datas_spark.operators.profile import mutual_information

    df = spark.createDataFrame([("x", "p"), ("x", "q")], "a string, b string")
    r = mutual_information(df, "a", "b").collect()[0]
    assert r["h_a"] == 0.0 and r["mi"] == 0.0
    assert r["nmi"] is None
