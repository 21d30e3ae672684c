"""Declarative expectations gate tests."""

from pyspark.sql import functions as F

import pytest

from datas_spark.operators import validate as V
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


# ---------------------------------------------------------------------------
# quarantine / k_anonymity
# ---------------------------------------------------------------------------

def test_quarantine_routes_and_reasons(spark):
    import pytest
    from pyspark.sql import functions as F
    from datas_spark.operators.validate import quarantine

    df = spark.createDataFrame(
        [(1, 5, "x"), (2, -1, "x"), (3, None, "y"), (4, -2, None)],
        "id bigint, v int, s string",
    )
    good, bad = quarantine(
        df, {"v_pos": F.col("v") >= 0, "s_present": F.col("s").isNotNull()}
    )
    assert [r.id for r in good.orderBy("id").collect()] == [1]
    got = {r.id: r.failed_rules for r in bad.collect()}
    assert got == {
        2: ["v_pos"],
        3: ["v_pos"],            # NULL predicate = violation
        4: ["s_present", "v_pos"],
    }
    # good + bad partition the input exactly
    assert good.count() + bad.count() == df.count()
    with pytest.raises(ValueError):
        quarantine(df, {})


def test_k_anonymity_counts_small_groups(spark):
    import pytest
    from datas_spark.operators.validate import k_anonymity

    rows = (
        [("a", "x")] * 10   # safe group
        + [("a", "y")] * 2  # at risk (< 5)
        + [("b", None)] * 3 # at risk; NULLs form a group
    )
    df = spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(rows)], "id bigint, q1 string, q2 string"
    )
    out = k_anonymity(df, ["q1", "q2"], k=5).collect()[0]
    assert out.n_rows == 15
    assert out.n_groups == 3
    assert out.min_group_size == 2
    assert out.rows_at_risk == 5
    assert abs(out.at_risk_pct - 5 / 15 * 100) < 1e-6
    with pytest.raises(ValueError):
        k_anonymity(df, [], k=5)
    with pytest.raises(ValueError):
        k_anonymity(df, ["q1"], k=1)


def test_l_diversity_flags_uniform_groups(spark):
    rows = (
        [("g1", "s", f"d{i}") for i in range(5)]      # diverse group
        + [("g2", "s", "same")] * 4                   # uniform → at risk
        + [("g3", "s", None), ("g3", "s", None)]      # all-NULL counts as 1 class
    )
    df = spark.createDataFrame(rows, ["q1", "q2", "sens"])
    row = V.l_diversity(df, ["q1", "q2"], "sens", l=2).collect()[0]
    assert row.n_groups == 3
    assert row.groups_below == 2
    assert row.rows_at_risk == 6
    assert row.min_distinct == 1


def test_l_diversity_null_plus_value_is_two_classes(spark):
    df = spark.createDataFrame(
        [("g", "x"), ("g", None)], "q string, sens string"
    )
    row = V.l_diversity(df, ["q"], "sens", l=2).collect()[0]
    assert row.min_distinct == 2 and row.groups_below == 0


def test_l_diversity_validates_args(spark):
    df = spark.createDataFrame([("a", "b")], ["q", "s"])
    with pytest.raises(ValueError):
        V.l_diversity(df, [], "s")
    with pytest.raises(ValueError):
        V.l_diversity(df, ["q"], "s", l=1)


# ---------------------------------------------------------------------------
# round 6: t-closeness
# ---------------------------------------------------------------------------


def test_t_closeness_skewed_group_flagged(spark):
    from datas_spark.operators.validate import t_closeness

    # global buckets 1/2 are 50/50; group "skew" is all bucket 2,
    # group "fair" mirrors the global split
    rows = [("skew", 2)] * 10 + [("fair", 1)] * 10 + [("fair", 2)] * 0
    # rebalance so global is 50/50: fair holds all of bucket 1
    df = spark.createDataFrame(rows, "g string, b int")
    r = t_closeness(df, ["g"], "b", t_num=1, t_den=5).collect()[0]
    # m=2: EMD(skew) = |0*20 - 10*10|/(10*20*1) = 0.5 > 0.2 -> at risk
    # EMD(fair) = |10*20 - 10*10|/(10*20*1) = 0.5 -> also at risk (all b=1)
    assert r["n_groups"] == 2
    assert r["groups_above"] == 2
    assert r["rows_at_risk"] == 20
    assert r["max_emd"] == 0.5


def test_t_closeness_matching_distribution_clean(spark):
    from datas_spark.operators.validate import t_closeness

    rows = []
    for g in ("a", "b"):
        rows += [(g, 1)] * 5 + [(g, 2)] * 5
    df = spark.createDataFrame(rows, "g string, b int")
    r = t_closeness(df, ["g"], "b", t_num=1, t_den=5).collect()[0]
    assert r["groups_above"] == 0 and r["rows_at_risk"] == 0
    assert r["max_emd"] == 0.0
    assert r["at_risk_pct"] == 0.0


def test_t_closeness_guards(spark):
    import pytest as _pytest

    from datas_spark.operators.validate import t_closeness

    df = spark.createDataFrame([("a", 1)], "g string, b int")
    with _pytest.raises(ValueError):
        t_closeness(df, [], "b")
    with _pytest.raises(ValueError):
        t_closeness(df, ["g"], "b", t_num=0)


def test_suggest_constraints_rules(spark):
    from datas_spark.operators.validate import suggest_constraints

    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "a", None), (4, None, 5.0)],
        "id long, cat string, v double",
    )
    got = {
        r.col_name: r
        for r in suggest_constraints(
            df, ["id", "cat", "v"], isin_cols=["cat"], isin_max=5
        ).collect()
    }
    assert got["id"].rules == "not_null; unique; range[1,4]"
    assert got["id"].n_nulls == 0 and got["id"].n_distinct == 4
    # cat has a NULL -> no not_null; 2 distinct over 3 non-null -> no unique
    assert got["cat"].rules == "isin[a,b]"
    assert got["cat"].n_nulls == 1
    # v: one NULL kills not_null; distinct non-nulls -> unique + range
    assert got["v"].rules == "unique; range[5.0,20.0]"


def test_suggest_constraints_rejects_undeclared_isin(spark):
    from datas_spark.operators.validate import suggest_constraints

    df = spark.createDataFrame([(1,)], "id long")
    with pytest.raises(ValueError):
        suggest_constraints(df, ["id"], isin_cols=["missing"])


def test_dp_release_audit_noise_is_laplace_shaped_and_deterministic(spark):
    """The md5 inverse-CDF draw: deterministic across runs, zero-mean-ish
    over many keys, scale shrinks as 1/epsilon, released counts never
    negative."""
    from datas_spark.operators.validate import dp_release_audit

    rows = [(f"k{i:03d}",) for i in range(200) for _ in range(i % 7 + 1)]
    df = spark.createDataFrame(rows, ["key"])
    a = {r.key: r for r in dp_release_audit(df, "key", epsilon=1.0).collect()}
    b = {r.key: r for r in dp_release_audit(df, "key", epsilon=1.0).collect()}
    assert a.keys() == b.keys()
    for k in a:
        assert a[k].noise == b[k].noise  # same draw every run
        assert a[k].n_released >= 0
        assert a[k].n_released == max(round(a[k].n_true + a[k].noise), 0)
    noises = [r.noise for r in a.values()]
    # Laplace(1): mean |noise| = 1; the 200-key empirical mean must be
    # in a generous band, and signs must mix
    mean_abs = sum(abs(x) for x in noises) / len(noises)
    assert 0.6 < mean_abs < 1.6
    assert any(x > 0 for x in noises) and any(x < 0 for x in noises)
    # epsilon=10 shrinks every draw 10x (same uniform, scaled b)
    tight = {
        r.key: r.noise
        for r in dp_release_audit(df, "key", epsilon=10.0).collect()
    }
    for k in a:
        assert abs(tight[k] - a[k].noise / 10.0) < 1e-5
    # a different seed is a different draw
    other = {
        r.key: r.noise
        for r in dp_release_audit(df, "key", epsilon=1.0, seed="dp2").collect()
    }
    assert any(other[k] != a[k].noise for k in a)


def test_dp_release_audit_rejects_bad_epsilon(spark):
    from datas_spark.operators.validate import dp_release_audit
    import pytest as _pytest

    df = spark.createDataFrame([("a",)], ["key"])
    with _pytest.raises(ValueError):
        dp_release_audit(df, "key", epsilon=0.0)
