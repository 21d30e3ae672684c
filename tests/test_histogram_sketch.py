"""Tests for the histogram sketch (registry_sketches): mergeability, error
bound vs exact percentiles, and the rank-delta trending query."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from datas_spark.io.sources import read_table
from datas_spark.operators.sketches import (
    histogram_quantiles,
    histogram_registers,
)
from datas_spark.registry_sketches import (
    _H_BINS,
    _H_HI,
    _H_LO,
    _H_QS,
    _H_W,
    q_events_value_hist_quantiles,
    q_weekly_type_rank_delta,
)


def test_histogram_registers_merge_like_the_whole(spark, sf_dir):
    """Sketching two halves and summing per-bin counts must equal
    sketching the whole — the mergeability contract."""
    ev = read_table(spark, sf_dir, "events").select("event_id", "value")
    a = histogram_registers(
        ev.where("event_id % 2 = 0"), "value", _H_LO, _H_HI, _H_BINS
    )
    b = histogram_registers(
        ev.where("event_id % 2 = 1"), "value", _H_LO, _H_HI, _H_BINS
    )
    merged = {
        r.bin: r.cnt
        for r in a.unionByName(b)
        .groupBy("bin")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
        .collect()
    }
    whole = {
        r.bin: r.cnt
        for r in histogram_registers(ev, "value", _H_LO, _H_HI, _H_BINS).collect()
    }
    assert merged == whole


def test_histogram_quantiles_within_one_bin_of_exact(spark, sf_dir):
    ev = read_table(spark, sf_dir, "events")
    exact = {
        q: ev.agg(F.percentile("value", F.lit(q)).alias("p")).collect()[0].p
        for q in _H_QS
    }
    got = {r.q: r.est for r in q_events_value_hist_quantiles(spark, sf_dir).collect()}
    for q in _H_QS:
        assert abs(got[q] - exact[q]) <= _H_W + 1e-9, (q, got[q], exact[q])


def test_histogram_validates_inputs(spark):
    df = spark.createDataFrame([(1.0,)], ["v"])
    with pytest.raises(ValueError):
        histogram_registers(df, "v", 0.0, 10.0, 0)
    with pytest.raises(ValueError):
        histogram_registers(df, "v", 10.0, 10.0, 4)
    regs = histogram_registers(df, "v", 0.0, 10.0, 4)
    with pytest.raises(ValueError):
        histogram_quantiles(regs, [], 0.0, 10.0, 4)
    with pytest.raises(ValueError):
        histogram_quantiles(regs, [1.5], 0.0, 10.0, 4)


def test_rank_delta_is_conservative(spark, sf_dir):
    """Within each week ranks are a permutation of 1..|types present|,
    and each type's delta equals its previous rank minus current."""
    rows = q_weekly_type_rank_delta(spark, sf_dir).collect()
    from collections import defaultdict

    by_week = defaultdict(list)
    by_type = defaultdict(list)
    for r in rows:
        by_week[r.week].append(r.rk)
        by_type[r.event_type].append((r.week, r.rk, r.rank_delta))
    for wk, rks in by_week.items():
        assert sorted(rks) == list(range(1, len(rks) + 1)), wk
    for t, seq in by_type.items():
        seq.sort()
        assert seq[0][2] is None  # first week: no prior
        for (w0, r0, _), (w1, r1, d1) in zip(seq, seq[1:]):
            assert d1 == r0 - r1
