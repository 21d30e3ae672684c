"""Smoke tests of the driver contract (__spark_entry__.py)."""

import __spark_entry__ as E


def test_entry_returns_rows(spark):
    df = E.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"doc_id", "text", "lang", "source", "n_chars"}


def test_queries_and_oracles_aligned(spark):
    qs, os_ = E.queries(), E.oracle_sql()
    assert qs, "queries() must not be empty"
    for name in os_:
        assert name in qs, f"oracle {name} has no query"


def test_each_query_runs_at_sf0001(spark, sf_dir):
    for name, fn in E.queries().items():
        df = fn(spark, sf_dir)
        assert df.count() >= 0, name
