"""Semantics tests for clustering.cluster_cohesion /
nearest_centroid_accuracy (registry_similarity)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from datas_spark.operators.clustering import (
    cluster_cohesion,
    nearest_centroid_accuracy,
)


def _emb(spark, rows):
    return spark.createDataFrame(rows, "vec_id bigint, label int, embedding array<float>")


def test_cohesion_matches_brute_force_pairwise(spark):
    import itertools

    rows = [
        (1, 0, [1.0, 0.0]),
        (2, 0, [0.8, 0.6]),
        (3, 0, [0.0, 1.0]),
        (4, 1, [-1.0, 0.0]),
        (5, 1, [-0.6, -0.8]),
    ]
    out = {r.label: r for r in cluster_cohesion(_emb(spark, rows), "label", "embedding").collect()}
    for lbl in (0, 1):
        vs = [v for (_, l, v) in rows if l == lbl]
        dots = [
            sum(a * b for a, b in zip(x, y))
            for x, y in itertools.combinations(vs, 2)
        ]
        expect = sum(dots) * 2 / (len(vs) * (len(vs) - 1))
        assert out[lbl].mean_pair_dot == pytest.approx(expect, abs=1e-5)
        cent = [sum(c) / len(vs) for c in zip(*vs)]
        assert out[lbl].centroid_norm == pytest.approx(
            math.sqrt(sum(c * c for c in cent)), abs=1e-5
        )


def test_cohesion_singleton_cluster_is_null(spark):
    rows = [(1, 0, [1.0, 0.0]), (2, 1, [0.0, 1.0]), (3, 1, [0.0, 0.9])]
    out = {r.label: r for r in cluster_cohesion(_emb(spark, rows), "label", "embedding").collect()}
    assert out[0].mean_pair_dot is None
    assert out[0].n_points == 1
    assert out[1].mean_pair_dot is not None


def test_nearest_centroid_perfect_separation(spark):
    rows = [
        (1, 0, [1.0, 0.0]), (2, 0, [0.9, 0.1]),
        (3, 1, [0.0, 1.0]), (4, 1, [0.1, 0.9]),
    ]
    out = {
        r.label: r
        for r in nearest_centroid_accuracy(_emb(spark, rows), "label", "embedding").collect()
    }
    for lbl in (0, 1):
        assert out[lbl].n_own == out[lbl].n_points == 2
        assert out[lbl].own_centroid_pct == 100.0


def test_nearest_centroid_detects_mislabel(spark):
    rows = [
        (1, 0, [1.0, 0.0]), (2, 0, [0.9, 0.1]), (3, 0, [0.95, 0.05]),
        (4, 1, [0.0, 1.0]), (5, 1, [0.1, 0.9]),
        (6, 1, [1.0, 0.0]),  # labeled 1 but sits in cluster 0
    ]
    out = {
        r.label: r
        for r in nearest_centroid_accuracy(_emb(spark, rows), "label", "embedding").collect()
    }
    assert out[0].n_own == 3
    assert out[1].n_points == 3
    assert out[1].n_own == 2  # the planted mislabel is caught


def test_nearest_centroid_counts_every_point_once(spark, sf_dir):
    from datas_spark.io.sources import read_table

    emb = read_table(spark, sf_dir, "embeddings")
    out = nearest_centroid_accuracy(emb, "label", "embedding").collect()
    assert sum(r.n_points for r in out) == emb.count()
    for r in out:
        assert 0 <= r.n_own <= r.n_points
