"""JS term drift: symmetry, one-sided term handling, known-shift detection."""

import pytest

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
