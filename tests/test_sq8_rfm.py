"""Semantics tests for registry_similarity (int8 ANN, RFM, percent-of-parent
rollup, timed funnel)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datas_spark.io.sources import read_table
from datas_spark.operators.events import funnel_counts
from datas_spark.operators.similarity import cosine_topk, sq8_topk


def test_sq8_recall_against_exact(spark, sf_dir):
    """With 4x oversampling on this data the quantized path should
    recover nearly all of the exact top-10 (and exactly rank what it
    recovers: rerank is exact cosine with the same tie-break)."""
    emb = read_table(spark, sf_dir, "embeddings")
    q = emb.where("vec_id < 3")
    exact = {
        (r.q_vec_id, r.d_vec_id)
        for r in cosine_topk(emb, q, "vec_id", "vec_id", "embedding", k=10).collect()
    }
    got = sq8_topk(emb, q, "vec_id", "vec_id", "embedding", k=10, oversample=4).collect()
    approx = {(r.q_vec_id, r.d_vec_id) for r in got}
    assert len(approx & exact) / len(exact) >= 0.9
    # per-query contract: exactly k rows, ranks 1..k, cos non-increasing
    by_q: dict = {}
    for r in got:
        by_q.setdefault(r.q_vec_id, []).append(r)
    for rows in by_q.values():
        rows.sort(key=lambda r: r.rank)
        assert [r.rank for r in rows] == list(range(1, 11))
        assert all(a.cos >= b.cos for a, b in zip(rows, rows[1:]))


def test_sq8_high_oversample_equals_exact(spark, sf_dir):
    """Oversampling wide enough to cover every row makes the quantized
    pass a no-op filter — output must EQUAL the exact top-k."""
    emb = read_table(spark, sf_dir, "embeddings").limit(60)
    q = emb.where("vec_id < 2")
    exact = sorted(
        (r.q_vec_id, r.d_vec_id, r.cos, r.rank)
        for r in cosine_topk(emb, q, "vec_id", "vec_id", "embedding", k=5).collect()
    )
    got = sorted(
        (r.q_vec_id, r.d_vec_id, r.cos, r.rank)
        for r in sq8_topk(
            emb, q, "vec_id", "vec_id", "embedding", k=5, oversample=100
        ).collect()
    )
    assert got == exact


def test_rfm_scores_partition_customers_into_quartile_bands(spark, sf_dir):
    from datas_spark.registry_similarity import q_customer_rfm_segments

    rows = q_customer_rfm_segments(spark, sf_dir).collect()
    assert rows
    n = len(rows)
    for field in ("r_score", "f_score", "m_score"):
        vals = [getattr(r, field) for r in rows]
        assert set(vals) <= {1, 2, 3, 4}
    # monetary quartiles: scores must be monotone in monetary value
    by_m = sorted(rows, key=lambda r: r.monetary)
    scores = [r.m_score for r in by_m]
    assert scores == sorted(scores)
    # each monetary band holds ≤ just over a quarter (ties can spill)
    from collections import Counter

    c = Counter(scores)
    assert max(c.values()) <= n * 0.30 + 2


def test_region_rollup_shares_sum_to_100(spark, sf_dir):
    from datas_spark.registry_similarity import q_region_share_rollup

    rows = q_region_share_rollup(spark, sf_dir).collect()
    assert rows
    by_region: dict = {}
    regions: dict = {}
    for r in rows:
        by_region.setdefault(r.region, []).append(r.pct_of_region)
        regions[r.region] = r.region_pct_of_global
    for pcts in by_region.values():
        assert sum(pcts) == pytest.approx(100.0, abs=1e-3)
    assert sum(regions.values()) == pytest.approx(100.0, abs=1e-3)


def test_timed_funnel_is_no_looser_than_untimed(spark, sf_dir):
    ev = read_table(spark, sf_dir, "events")
    steps = ["view", "click", "purchase"]
    untimed = funnel_counts(ev, steps).collect()[0]
    timed = funnel_counts(ev, steps, max_gap="1 hour").collect()[0]
    assert timed.n_step_0 == untimed.n_step_0  # stage 0 has no gap
    assert timed.n_step_1 <= untimed.n_step_1
    assert timed.n_step_2 <= untimed.n_step_2


def test_timed_funnel_gap_boundary_inclusive(spark):
    rows = [
        (1, "2020-01-01 00:00:00", 1, "view"),
        (2, "2020-01-01 01:00:00", 1, "click"),   # exactly 1h: counts
        (3, "2020-01-01 00:00:00", 2, "view"),
        (4, "2020-01-01 01:00:01", 2, "click"),   # 1h+1s: dropped
    ]
    df = (
        spark.createDataFrame(
            rows, "event_id bigint, ts string, user_id bigint, event_type string"
        )
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withColumn("value", F.lit(0.0))
    )
    out = funnel_counts(df, ["view", "click"], max_gap="1 hour").collect()[0]
    assert out.n_step_0 == 2
    assert out.n_step_1 == 1
