"""JS term drift: symmetry, one-sided term handling, known-shift detection."""

import pytest
from pyspark.sql import functions as F

from datas_spark.operators import drift as DR
from datas_spark.operators.drift import term_drift


@pytest.fixture(scope="module")
def corpora(spark):
    a = spark.createDataFrame(
        [("alpha alpha alpha common common",), ("alpha common",)], "text: string"
    )
    b = spark.createDataFrame(
        [("beta beta beta common common",), ("beta common",)], "text: string"
    )
    return a, b


def test_drift_flags_shifted_terms(corpora):
    a, b = corpora
    got = term_drift(a, b, "text", top_n=3).collect()
    top_terms = [r["term"] for r in got]
    # alpha and beta are the one-sided terms; common is shared
    assert set(top_terms[:2]) == {"alpha", "beta"}
    assert all(r["js_contrib"] > 0 for r in got[:2])
    common = [r for r in got if r["term"] == "common"]
    if common:
        assert common[0]["js_contrib"] < got[0]["js_contrib"]


def test_drift_is_symmetric(corpora):
    a, b = corpora
    ab = {r["term"]: r["js_contrib"] for r in term_drift(a, b, "text", top_n=10).collect()}
    ba = {r["term"]: r["js_contrib"] for r in term_drift(b, a, "text", top_n=10).collect()}
    assert ab == ba  # JS is symmetric


def test_identical_corpora_have_zero_drift(spark):
    a = spark.createDataFrame([("same words here",)], "text: string")
    got = term_drift(a, a, "text", top_n=5).collect()
    assert all(abs(r["js_contrib"]) < 1e-12 for r in got)


# --- PSI (batch 58) -----------------------------------------------------

def test_feature_psi_identical_distributions_near_zero(spark):
    ref = spark.range(1000).select((F.col("id") % 100).cast("double").alias("v"))
    out = DR.feature_psi(ref, ref, "v", bins=10).collect()
    assert len(out) == 10
    total = sum(r.psi_term for r in out)
    assert abs(total) < 1e-6
    assert sum(r.n_ref for r in out) == 1000
    assert sum(r.n_cur for r in out) == 1000


def test_feature_psi_shifted_distribution_flags_drift(spark):
    ref = spark.range(2000).select((F.col("id") % 100).cast("double").alias("v"))
    cur = spark.range(2000).select((F.col("id") % 100 + 50).cast("double").alias("v"))
    out = DR.feature_psi(ref, cur, "v", bins=10).collect()
    total = sum(r.psi_term for r in out)
    assert total > 0.25  # "action" threshold
    # low reference bins are empty in cur
    low = [r for r in out if r.bin == 0][0]
    assert low.n_cur == 0 and low.n_ref > 0


def test_feature_psi_excludes_nulls(spark):
    ref = spark.createDataFrame([(1.0,), (2.0,), (None,)], ["v"])
    cur = spark.createDataFrame([(1.0,), (None,)], ["v"])
    out = DR.feature_psi(ref, cur, "v", bins=2).collect()
    assert sum(r.n_ref for r in out) == 2
    assert sum(r.n_cur for r in out) == 1
