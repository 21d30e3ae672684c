"""Empty-input robustness: at 100 TB scale, empty shards and
filtered-to-nothing frames are routine — every operator family must
plan and execute on zero rows without crashing."""

from pyspark.sql import functions as F


def test_dedup_family_empty(spark):
    from datas_spark.operators import dedup as D

    docs = spark.createDataFrame([], "doc_id long, text string")
    assert D.exact_dedup(docs, "text", "doc_id").count() == 0
    assert D.minhash_signature(docs, "text").count() == 0
    assert D.minhash_lsh_pairs(docs, "doc_id", "text").count() == 0
    assert D.ngram_jaccard_pairs(docs, "doc_id", "text").count() == 0
    pairs = spark.createDataFrame([], "id_a long, id_b long")
    assert D.connected_components(pairs).count() == 0
    assert D.connected_components(pairs, algorithm="star").count() == 0
    assert D.near_dedup_keep_first(docs, "doc_id", pairs).count() == 0


def test_similarity_family_empty_data_side(spark):
    from datas_spark.operators import similarity as SIM

    data = spark.createDataFrame([], "id long, v array<double>")
    queries = spark.createDataFrame([(0, [1.0, 0.0])], "id long, v array<double>")
    assert SIM.cosine_topk(data, queries, "id", "id", "v", k=3).count() == 0
    assert SIM.cosine_topk_vectorized(data, queries, "id", "id", "v", k=3).count() == 0
    assert SIM.lsh_topk(data, queries, "id", "id", "v", k=3, dim=2, n_probe=2).count() == 0


def test_corpus_family_empty(spark):
    from datas_spark.operators import corpus as C

    docs = spark.createDataFrame([], "doc_id long, text string, lang string")
    bench = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
    assert C.ngram_contamination(docs, bench, "doc_id", "text").count() == 0
    assert C.stratified_sample(docs, "lang", "doc_id", 0.5).count() == 0
    assert C.source_quota_cap(docs, "lang", "doc_id", 5).count() == 0
    assert C.tfidf_top_terms(docs, "doc_id", "text").count() == 0
    assert C.pack_sequences(docs, "doc_id", "text", 100).count() == 0
    assert C.hash_split(docs, "doc_id").count() == 0
    assert C.repetition_stats(docs, "doc_id", "text").count() == 0
    assert C.temperature_sample(docs, "lang", "doc_id", 2.0).count() == 0


def test_contamination_empty_benchmark_flags_nothing(spark):
    from datas_spark.operators import corpus as C

    docs = spark.createDataFrame([(1, "a b c d e f")], "doc_id long, text string")
    empty_bench = spark.createDataFrame([], "doc_id long, text string")
    rows = C.ngram_contamination(docs, empty_bench, "doc_id", "text").collect()
    assert [(r.doc_id, r.shared_ngrams, r.contaminated) for r in rows] == [(1, 0, 0)]


def test_selection_family_empty(spark):
    from datas_spark.operators import selection as S

    df = spark.createDataFrame([], "row_id long, cluster string, conf double")
    assert S.middle_confidence_sample(df, "cluster", "conf", "row_id").count() == 0
    assert S.stride_sample_skew_resistant(df, "cluster", "row_id", 5, num_partitions=4).count() == 0


def test_round3_operators_empty_inputs(spark):
    from datas_spark.operators import corpus as C
    from datas_spark.operators import joins as J
    from datas_spark.operators.clustering import standardize_embeddings
    from datas_spark.operators.dedup import pagerank
    from datas_spark.pipeline.curate import curate_corpus

    docs = spark.createDataFrame([], "doc_id long, text string, lang string")
    assert C.weighted_sample_per_key(docs.withColumn("w", F.lit(1.0)), "lang", "doc_id", "w", 5).count() == 0
    assert C.zscore_outliers(docs.withColumn("v", F.lit(1.0)), "lang", "v").count() == 0
    assert C.value_deciles(docs.withColumn("v", F.lit(1)), "v").count() == 0
    assert C.pack_sequences_tokenized(docs, "doc_id", "text", 100).count() == 0
    assert (
        curate_corpus(docs, near_dup_threshold=0.2, redact_pii=True,
                      paragraph_dedup_delimiter=" ", split_weights={"train": 1.0}).count()
        == 0
    )
    pairs = spark.createDataFrame([], "id_a long, id_b long")
    assert pagerank(pairs).count() == 0
    emb = spark.createDataFrame([], "vec_id long, embedding array<double>")
    assert standardize_embeddings(emb, "vec_id", "embedding").count() == 0
    # asof: empty right side (rows, not columns) keeps left-outer NULLs
    left = spark.createDataFrame([(1, 10)], "id long, ts long")
    right = spark.createDataFrame([], "id long, ts long, tag string")
    rows = J.asof_join(left, right, "id", "ts", "ts").collect()
    assert len(rows) == 1 and rows[0].r_tag is None
    salted = J.asof_join(left, right, "id", "ts", "ts", salt_buckets=4).collect()
    assert len(salted) == 1 and salted[0].r_tag is None
