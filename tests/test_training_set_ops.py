"""Semantics tests for registry_mlfeatures: hard-negative mining, exact label
rebalancing, per-source calibration."""

from __future__ import annotations

from collections import Counter, defaultdict

import pytest

from pyspark.sql import functions as F

from datas_spark.io.sources import read_table
from datas_spark.operators.corpus import rebalance_labels
from datas_spark.registry_mlfeatures import (
    q_hard_negative_mining,
    q_label_rebalance,
    q_source_calibrated_quality,
)


def test_hard_negatives_never_share_the_anchor_label(spark, sf_dir):
    emb = {
        r.vec_id: r.label
        for r in read_table(spark, sf_dir, "embeddings")
        .select("vec_id", "label")
        .collect()
    }
    out = q_hard_negative_mining(spark, sf_dir).collect()
    per_q = defaultdict(list)
    for r in out:
        assert emb[r.d_vec_id] != emb[r.q_vec_id]
        per_q[r.q_vec_id].append(r.rank)
    for q, ranks in per_q.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))


def test_rebalance_brings_every_class_to_target(spark, sf_dir):
    out = q_label_rebalance(spark, sf_dir).collect()
    per_label = Counter(r.label for r in out)
    raw = Counter(
        r.label
        for r in read_table(spark, sf_dir, "embeddings").select("label").collect()
    )
    target = max(raw.values())
    assert set(per_label) == set(raw)
    for lbl, n in per_label.items():
        assert n == target, lbl
    # copies of one source row are contiguous 1..rep
    per_row = defaultdict(list)
    for r in out:
        per_row[(r.label, r.vec_id)].append(r.copy_idx)
    for (lbl, vid), idxs in per_row.items():
        assert sorted(idxs) == list(range(1, len(idxs) + 1))


def test_rebalance_downsamples_above_target(spark):
    df = spark.createDataFrame(
        [(i, "big") for i in range(10)] + [(100 + i, "small") for i in range(3)],
        ["id", "lbl"],
    )
    out = rebalance_labels(df, "id", "lbl", target=4).collect()
    per = Counter(r.lbl for r in out)
    assert per == {"big": 4, "small": 4}
    # downsampled class keeps single copies only
    assert all(r.copy_idx == 1 for r in out if r.lbl == "big")


def test_rebalance_rejects_negative_target(spark):
    df = spark.createDataFrame([(1, "a")], ["id", "lbl"])
    with pytest.raises(ValueError):
        rebalance_labels(df, "id", "lbl", target=-1)


def test_calibration_is_within_source_percent_rank(spark, sf_dir):
    rows = q_source_calibrated_quality(spark, sf_dir).collect()
    by_source = defaultdict(list)
    for r in rows:
        by_source[r.source].append(r)
    for src, rs in by_source.items():
        rs.sort(key=lambda r: (r.quality, r.doc_id))
        # bounds: worst row 0.0, best row 1.0 (n > 1 per source)
        assert rs[0].calibrated == 0.0
        assert rs[-1].calibrated == 1.0
        # monotone in quality; equal qualities share a calibrated value
        for a, b in zip(rs, rs[1:]):
            if a.quality == b.quality:
                assert a.calibrated == b.calibrated
            else:
                assert a.calibrated < b.calibrated
