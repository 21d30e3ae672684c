"""Semantics tests for registry_similarity (random projection, dedup-rate
report, language confusion matrix)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from datas_spark.operators.clustering import random_projection


def test_random_projection_separates_planted_clusters(spark):
    """JL property on STRUCTURED data (near-isotropic random vectors
    have nearly-equal pairwise distances, where any projection's rank
    order is noise): two tight, well-separated clusters must stay
    separated after projection — every cross-cluster distance larger
    than every within-cluster distance."""
    import random as pyrandom

    rng = pyrandom.Random(7)
    rows = []
    for i in range(10):  # cluster A around +5 on the first 8 dims
        rows.append((i, [5.0 + rng.uniform(-0.2, 0.2)] * 8 + [0.0] * 56))
    for i in range(10, 20):  # cluster B around −5
        rows.append((i, [-5.0 + rng.uniform(-0.2, 0.2)] * 8 + [0.0] * 56))
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    out = random_projection(df, "embedding", k=8).collect()

    def d(a, b):
        return math.sqrt(sum((x - y) ** 2 for x, y in zip(a, b)))

    zs = {r.vec_id: r.z for r in out}
    within = [
        d(zs[i], zs[j])
        for grp in (range(10), range(10, 20))
        for i in grp
        for j in grp
        if i < j
    ]
    across = [d(zs[i], zs[j]) for i in range(10) for j in range(10, 20)]
    assert max(within) < min(across)


def test_random_projection_deterministic_and_seed_sensitive(spark, sf_dir):
    from datas_spark.io.sources import read_table

    emb = read_table(spark, sf_dir, "embeddings").limit(5)
    a = random_projection(emb, "embedding", k=4, seed=1).select("z").collect()
    b = random_projection(emb, "embedding", k=4, seed=1).select("z").collect()
    c = random_projection(emb, "embedding", k=4, seed=2).select("z").collect()
    assert [r.z for r in a] == [r.z for r in b]
    assert [r.z for r in a] != [r.z for r in c]


def test_dedup_rate_counts_planted_duplicates(spark):
    from datas_spark.registry import QUERIES  # noqa: F401  (registry import side effects)
    from datas_spark.functions.text import normalized_text

    rows = [
        (1, "Hello World", "a"),
        (2, "hello,   world!", "a"),   # same after normalization
        (3, "something else", "a"),
        (4, "unique text", "b"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string, source string")
    got = {
        r.source: r
        for r in df.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.count_distinct(F.md5(normalized_text("text"))).cast("long").alias("n_unique"),
        )
        .collect()
    }
    assert got["a"].n_docs == 3 and got["a"].n_unique == 2
    assert got["b"].n_docs == 1 and got["b"].n_unique == 1


def test_lang_confusion_rows_sum_to_100_per_declared(spark, sf_dir):
    from datas_spark.registry_similarity import q_lang_id_confusion

    rows = q_lang_id_confusion(spark, sf_dir).collect()
    assert rows
    per_declared: dict = {}
    for r in rows:
        per_declared.setdefault(r.declared, []).append(r.pct_of_declared)
    for decl, pcts in per_declared.items():
        assert sum(pcts) == pytest.approx(100.0, abs=1e-3), decl
