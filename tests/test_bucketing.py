"""Bucketed co-located joins — the taskvector module's scale claim
(checkpoint tables written bucketed by key join WITHOUT an exchange).

Verifies the physical plan: joining two tables bucketed on the same
key shows no Exchange on either join branch, while the plain-parquet
join does.
"""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def bucketed_pair(spark, tmp_path_factory):
    warehouse = tmp_path_factory.mktemp("warehouse")
    a = spark.range(0, 10000).select(
        (F.col("id") % 64).cast("string").alias("key"),
        F.col("id").alias("idx"),
        (F.col("id") * 0.5).alias("value"),
    )
    b = a.withColumn("value", F.col("value") * 2)
    for name, df in [("ckpt_a", a), ("ckpt_b", b)]:
        (
            df.write.mode("overwrite")
            .option("path", str(warehouse / name))
            .bucketBy(8, "key", "idx")
            .sortBy("key", "idx")
            .saveAsTable(name)
        )
    yield "ckpt_a", "ckpt_b"
    for name in ("ckpt_a", "ckpt_b"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_bucketed_join_has_no_exchange(spark, bucketed_pair):
    ta, tb = bucketed_pair
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table(ta).alias("a").join(
            spark.table(tb).alias("b"), ["key", "idx"]
        ).select("key", "idx", (F.col("b.value") - F.col("a.value")).alias("tv"))
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan  # co-located: bucketing satisfies the join
        # and the result is the task-vector diff, correct
        row = joined.where("idx = 100").collect()[0]
        assert row.tv == 50.0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_unbucketed_join_needs_exchange(spark, bucketed_pair, tmp_path):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        a = spark.table(bucketed_pair[0])
        plain = str(tmp_path / "plain")
        a.write.parquet(plain)
        p = spark.read.parquet(plain)
        joined = a.join(p, ["key", "idx"])
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
