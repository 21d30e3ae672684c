"""Semantics tests for registry_events: MAD outliers and the token-budget
mixture sampler."""

from __future__ import annotations

from collections import defaultdict

import pytest

from datas_spark.operators.corpus import token_budget_mixture
from datas_spark.registry_events import (
    _MIX_BUDGETS,
    q_events_value_outliers,
    q_token_budget_mixture,
)


def test_mad_outliers_flag_planted_extreme(spark):
    """On a tiny planted frame the medians are knowable by hand: values
    10×{1..9} plus one 10_000 — only the plant exceeds 3·MAD."""
    rows = [(i, "t", float(10 * i)) for i in range(1, 10)] + [(99, "t", 10_000.0)]
    df = spark.createDataFrame(rows, ["event_id", "event_type", "value"])
    from pyspark.sql import functions as F

    stats = df.groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(0.5)), 6).alias("med")
    )
    mad = (
        df.join(F.broadcast(stats), "event_type")
        .groupBy("event_type", "med")
        .agg(
            F.round(
                F.percentile(F.abs(F.col("value") - F.col("med")), F.lit(0.5)), 6
            ).alias("mad")
        )
    )
    s = stats.collect()[0]
    m = mad.collect()[0]
    flagged = (
        df.join(F.broadcast(stats), "event_type")
        .join(F.broadcast(mad.drop("med")), "event_type")
        .where(F.abs(F.col("value") - F.col("med")) > 3.0 * F.col("mad"))
        .collect()
    )
    assert s.med == pytest.approx(55.0)  # interpolated between 50 and 60
    assert m.mad > 0
    assert [r.event_id for r in flagged] == [99]


def test_outlier_query_respects_the_mad_rule(spark, sf_dir):
    out = q_events_value_outliers(spark, sf_dir).collect()
    assert len(out) > 0
    for r in out:
        assert abs(r.value - r.med) > 3.0 * r.mad


def test_mixture_fills_each_budget_as_a_greedy_prefix(spark, sf_dir):
    out = q_token_budget_mixture(spark, sf_dir).collect()
    by_src = defaultdict(int)
    max_chars = defaultdict(int)
    for r in out:
        by_src[r.source] += r.n_chars
        max_chars[r.source] = max(max_chars[r.source], r.n_chars)
    assert set(by_src) <= set(_MIX_BUDGETS)
    for src, tot in by_src.items():
        budget = _MIX_BUDGETS[src]
        # filled to budget; overflow bounded by the last doc's size
        assert tot < budget + max_chars[src]
        assert tot >= min(budget, tot)


def test_mixture_excludes_unbudgeted_keys_and_validates(spark):
    df = spark.createDataFrame(
        [(1, "a", 5), (2, "a", 5), (3, "b", 5)], ["doc_id", "src", "w"]
    )
    out = token_budget_mixture(df, "src", "w", {"a": 7}, id_col="doc_id")
    rows = out.collect()
    assert {r.src for r in rows} == {"a"}
    # budget 7 admits the first doc (cum 5) and the second (starts at 5 < 7)
    assert len(rows) == 2
    with pytest.raises(ValueError):
        token_budget_mixture(df, "src", "w", {})
    with pytest.raises(ValueError):
        token_budget_mixture(df, "src", "w", {"a": -1})


def test_rebalance_skew_resistant_twin_is_identical(spark, sf_dir):
    from datas_spark.io.sources import read_table
    from datas_spark.operators.corpus import rebalance_labels

    emb = read_table(spark, sf_dir, "embeddings").select("vec_id", "label")
    base = sorted(
        (r.vec_id, r.label, r.copy_idx)
        for r in rebalance_labels(emb, "vec_id", "label").collect()
    )
    skew = sorted(
        (r.vec_id, r.label, r.copy_idx)
        for r in rebalance_labels(
            emb, "vec_id", "label", skew_resistant=True
        ).collect()
    )
    assert base == skew


def test_mixture_skew_resistant_twin_is_identical(spark, sf_dir):
    from datas_spark.io.sources import read_table
    from datas_spark.operators.corpus import token_budget_mixture
    from datas_spark.registry_events import _MIX_BUDGETS

    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    base = sorted(
        (r.doc_id, r.source)
        for r in token_budget_mixture(
            docs, "source", "n_chars", _MIX_BUDGETS, id_col="doc_id"
        ).collect()
    )
    skew = sorted(
        (r.doc_id, r.source)
        for r in token_budget_mixture(
            docs, "source", "n_chars", _MIX_BUDGETS, id_col="doc_id",
            skew_resistant=True,
        ).collect()
    )
    assert base == skew
