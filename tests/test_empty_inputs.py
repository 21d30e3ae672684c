"""Empty-input robustness: at 100 TB scale, empty shards and
filtered-to-nothing frames are routine — every operator family must
plan and execute on zero rows without crashing."""

import pytest

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


@pytest.mark.slow
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


@pytest.mark.slow
def test_round8_operators_empty_inputs(spark):
    """Round-8 additions on zero rows: plans build and execute."""
    from datas_spark.operators.dedup import label_propagation
    from datas_spark.operators.evalmetrics import (
        bt_rating_k,
        pass_at_k,
        split_conformal_audit,
    )
    from datas_spark.operators.events import (
        hte_segments,
        markov_attribution,
        quantile_treatment_effect,
        sequential_looks,
        uplift_curve,
    )
    from datas_spark.operators.linkage import golden_records
    from datas_spark.operators.validate import dp_release_audit

    pairs = spark.createDataFrame([], "id_a long, id_b long")
    assert label_propagation(pairs, 3).count() == 0

    comps = spark.createDataFrame([], "winner string, loser string")
    assert bt_rating_k(comps, "winner", "loser", 3).count() == 0

    resp = spark.createDataFrame([], "g string, ok int")
    assert pass_at_k(resp, "g", "ok", [1, 2]).count() == 0

    scored = spark.createDataFrame([], "split string, y double, pred double")
    r = split_conformal_audit(scored, "split", "y", "pred").collect()[0]
    # empty calibration: k = ceil(0.9 * 1) = 1 > 0 -> infinite interval
    assert r.n_cal == 0 and r.q_hat is None and r.coverage_pct == 100.0

    units = spark.createDataFrame([], "arm int, y long")
    assert quantile_treatment_effect(units, "arm", "y", (0.5,)).count() == 0
    assert uplift_curve(
        spark.createDataFrame([], "arm int, s int, y int"), "arm", "s", "y"
    ).count() == 0
    assert hte_segments(
        spark.createDataFrame([], "segment string, arm int, y long"),
        "segment", "arm", "y",
    ).count() == 0
    assert sequential_looks(
        spark.createDataFrame([], "look int, arm int, y long"),
        "look", "arm", "y",
    ).count() == 0

    ev = spark.createDataFrame(
        [], "user_id long, ts timestamp, event_id long, event_type string"
    )
    assert markov_attribution(
        ev, "user_id", "ts", "event_id", "event_type", "purchase"
    ).count() == 0

    recs = spark.createDataFrame([], "rec_id long, name string")
    assert golden_records(recs, "rec_id", pairs, ["name"]).count() == 0

    docs = spark.createDataFrame([], "key string")
    assert dp_release_audit(docs, "key").count() == 0
