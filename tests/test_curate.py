"""End-to-end curation recipe invariants."""

from pyspark.sql import functions as F

from datas_spark.pipeline.curate import curate_corpus


def test_curate_corpus_invariants(spark, sf_dir):
    from datas_spark.io.sources import read_table

    docs = read_table(spark, sf_dir, "documents")
    bench = docs.where("doc_id < 10")
    out = curate_corpus(
        docs,
        benchmark=bench,
        domain_col="lang",
        temperature=2.0,
        split_weights={"train": 0.8, "test": 0.2},
    ).cache()
    n = out.count()
    assert 0 < n <= docs.count()
    # survivors are distinct on the normalized-text fingerprint
    from datas_spark.functions.text import normalized_text

    fps = out.select(F.xxhash64(normalized_text("text")).alias("fp"))
    assert fps.distinct().count() == n
    # the benchmark slice itself can never survive decontamination
    # (every bench doc trivially shares all its shingles with itself)
    assert out.where("doc_id < 10").count() == 0
    # split labels are complete and valid
    assert out.where(~F.col("split").isin("train", "test")).count() == 0
    out.unpersist()


def test_curate_corpus_passthrough_defaults(spark):
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "delta epsilon zeta")],
        "doc_id long, text string",
    )
    out = curate_corpus(docs)
    assert sorted(r.doc_id for r in out.collect()) == [1, 2]
    assert "split" not in out.columns
