"""Declarative expectations gate tests."""

from pyspark.sql import functions as F

from datas_spark.operators.validate import expect


def test_expect_counts_violations_single_pass(spark):
    df = spark.createDataFrame(
        [(1, "a", 5), (2, None, 3), (3, "c", -1), (4, "d", 0)],
        "id long, s string, n long",
    )
    got = {
        r.rule: (r.violations, r.total, r["pass"])
        for r in expect(
            df,
            {
                "s_not_null": F.col("s").isNotNull(),
                "n_positive": F.col("n") > 0,
            },
        ).collect()
    }
    assert got == {"s_not_null": (1, 4, 0), "n_positive": (2, 4, 0)}


def test_expect_null_predicate_counts_as_violation(spark):
    # comparing against NULL yields NULL — must count as a violation
    df = spark.createDataFrame([(1, None)], "id long, n double")
    got = expect(df, {"n_gt_0": F.col("n") > 0}).collect()[0]
    assert (got.violations, got["pass"]) == (1, 0)


def test_expect_all_pass(spark):
    df = spark.createDataFrame([(1,), (2,)], "id long")
    got = expect(df, {"id_pos": F.col("id") > 0}).collect()[0]
    assert (got.violations, got.total, got["pass"]) == (0, 2, 1)
