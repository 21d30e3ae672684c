"""Smoke tests of the driver contract (__spark_entry__.py)."""

import __spark_entry__ as E
from sweep_utils import sweep_sample


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
    qs = E.queries()
    for name in sweep_sample(sorted(qs)):
        df = qs[name](spark, sf_dir)
        assert df.count() >= 0, name


def test_full_pipeline_invariants(spark, sf_dir):
    """datas_full_pipeline: ≤ n rows per cluster, subset of source,
    deterministic under the pinned seed."""
    fn = E.queries()["datas_full_pipeline"]
    out = fn(spark, sf_dir)
    rows = out.collect()
    assert 0 < len(rows) <= 5 * 5  # k=5 clusters × n=5 quota
    src_ids = {r.doc_id for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()}
    assert {r.doc_id for r in rows} <= src_ids
    again = {r.doc_id for r in fn(spark, sf_dir).collect()}
    assert {r.doc_id for r in rows} == again
