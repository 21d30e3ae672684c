"""Sketch family: HLL accuracy/determinism, CMS upper-bound contract,
Bloom no-false-negative contract + FPR sanity, and the map-side plan
shape of the Bloom probe."""

import math

import pytest
from pyspark.sql import functions as F

from datas_spark.operators import sketches as SK


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/events.parquet")


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# ---------------------------------------------------------------------------
# HyperLogLog
# ---------------------------------------------------------------------------

def test_hll_registers_bounded(events):
    regs = SK.hll_registers(events, "user_id", p=10).collect()
    assert 0 < len(regs) <= 1024
    for r in regs:
        assert 0 <= r["bucket"] < 1024
        assert 1 <= r["max_rho"] <= 51  # w + 1 = (60 - 10) + 1


def test_hll_estimate_close_to_exact(events):
    exact = events.select("user_id").distinct().count()
    est = SK.hll_cardinality(events, "user_id", p=12).collect()[0]["estimate"]
    # p=12 gives ~1.6% standard error in the HLL regime; in the
    # linear-counting regime (small n) it is tighter still
    assert est == pytest.approx(exact, rel=0.15)


def test_hll_estimate_deterministic_and_union_invariant(events):
    """Same data -> identical estimate; splitting the input and
    unioning register tables (max per bucket) = sketching the union —
    the mergeability property that makes HLL work across partitions."""
    a = SK.hll_cardinality(events, "user_id", p=12).collect()[0]["estimate"]
    b = SK.hll_cardinality(events, "user_id", p=12).collect()[0]["estimate"]
    assert a == b

    left = SK.hll_registers(events.where("event_id % 2 = 0"), "user_id", p=12)
    right = SK.hll_registers(events.where("event_id % 2 = 1"), "user_id", p=12)
    merged = (
        left.unionByName(right)
        .groupBy("bucket")
        .agg(F.max("max_rho").alias("max_rho"))
    )
    whole = SK.hll_registers(events, "user_id", p=12)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, whole.collect()))


def test_hll_nulls_excluded(spark):
    df = spark.createDataFrame(
        [(i,) for i in range(100)] + [(None,)] * 50, "v: int"
    )
    est = SK.hll_cardinality(df, "v", p=12).collect()[0]["estimate"]
    assert est == pytest.approx(100, rel=0.1)


def test_hll_p_validation(events):
    with pytest.raises(ValueError):
        SK.hll_registers(events, "user_id", p=4)


# ---------------------------------------------------------------------------
# Count-min
# ---------------------------------------------------------------------------

def test_cms_never_undercounts(events):
    regs = SK.cms_registers(events, "event_type", depth=3, width=64)
    probes = events.select("event_type").distinct()
    est = {
        r["event_type"]: r["est_count"]
        for r in SK.cms_point_estimates(
            regs, probes, "event_type", depth=3, width=64
        ).collect()
    }
    truth = {
        r["event_type"]: r["count"]
        for r in events.groupBy("event_type").count().collect()
    }
    assert set(est) == set(truth)
    for k, t in truth.items():
        assert est[k] >= t


def test_cms_wide_sketch_is_exact_for_small_domains(events):
    """With width >> #distinct, collisions are (md5-)unlikely and the
    min over depth rows recovers the exact counts."""
    regs = SK.cms_registers(events, "event_type", depth=4, width=4096)
    probes = events.select("event_type").distinct()
    est = {
        r["event_type"]: r["est_count"]
        for r in SK.cms_point_estimates(
            regs, probes, "event_type", depth=4, width=4096
        ).collect()
    }
    truth = {
        r["event_type"]: r["count"]
        for r in events.groupBy("event_type").count().collect()
    }
    assert est == truth


def test_cms_absent_probe_estimates_small(spark, events):
    regs = SK.cms_registers(events, "event_type", depth=4, width=4096)
    probes = spark.createDataFrame([("no-such-type-xyz",)], "event_type: string")
    est = SK.cms_point_estimates(
        regs, probes, "event_type", depth=4, width=4096
    ).collect()[0]["est_count"]
    assert est == 0  # all 4 cells empty at this width


def test_cms_register_table_bounded(events):
    regs = SK.cms_registers(events, "user_id", depth=4, width=32)
    assert regs.count() <= 4 * 32


# ---------------------------------------------------------------------------
# Bloom
# ---------------------------------------------------------------------------

def test_bloom_no_false_negatives(docs):
    bench = docs.where("doc_id % 7 = 0")
    bs = SK.bloom_bitset(bench, "text", m_bits=6000, k=4)
    hits = SK.bloom_contains(bench, "text", bs, m_bits=6000, k=4, keep="hits")
    assert hits.count() == bench.count()


def test_bloom_hits_misses_partition_probe(docs):
    bench = docs.where("doc_id % 7 = 0")
    probe = docs.where("doc_id % 7 != 0")
    bs = SK.bloom_bitset(bench, "text", m_bits=6000, k=4)
    n_h = SK.bloom_contains(probe, "text", bs, m_bits=6000, k=4, keep="hits").count()
    n_m = SK.bloom_contains(probe, "text", bs, m_bits=6000, k=4, keep="misses").count()
    assert n_h + n_m == probe.count()


def test_bloom_fpr_within_analytic_bound(spark):
    """Disjoint probe keys: observed FPR should not wildly exceed the
    analytic (1 - e^{-kn/m})^k rate."""
    m_bits, k, n = 4096, 4, 300
    members = spark.createDataFrame([(f"m{i}",) for i in range(n)], "v: string")
    others = spark.createDataFrame([(f"x{i}",) for i in range(2000)], "v: string")
    bs = SK.bloom_bitset(members, "v", m_bits=m_bits, k=k)
    fp = SK.bloom_contains(others, "v", bs, m_bits=m_bits, k=k).count()
    pred = SK.bloom_fpr(m_bits, k, n)
    assert fp / 2000.0 <= max(3 * pred, 0.02)


def test_bloom_null_semantics(spark):
    members = spark.createDataFrame([("a",), ("b",)], "v: string")
    probe = spark.createDataFrame([("a",), (None,)], "v: string")
    bs = SK.bloom_bitset(members, "v", m_bits=600, k=3)
    hits = SK.bloom_contains(probe, "v", bs, m_bits=600, k=3, keep="hits")
    misses = SK.bloom_contains(probe, "v", bs, m_bits=600, k=3, keep="misses")
    assert [r["v"] for r in hits.collect()] == ["a"]
    assert [r["v"] for r in misses.collect()] == [None]


def test_bloom_probe_is_map_side(docs):
    """The membership probe must compile to a pure filter over the scan
    — no join, no shuffle (the 100 TB contract)."""
    bench = docs.where("doc_id % 7 = 0")
    bs = SK.bloom_bitset(bench, "text", m_bits=6000, k=4)
    probed = SK.bloom_contains(docs, "text", bs, m_bits=6000, k=4)
    s = probed._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in s and "Exchange" not in s


def test_bloom_word_table_bounded(docs):
    bs = SK.bloom_bitset(docs, "text", m_bits=6000, k=4)
    rows = bs.collect()
    assert len(rows) <= (6000 + 59) // 60
    for r in rows:
        assert r["bits"] > 0  # bit 59 cap keeps words positive


def test_bloom_validation():
    assert SK.bloom_fpr(9600, 4, 1000) < 0.02
    with pytest.raises(ValueError):
        SK.bloom_contains(None, "v", None, keep="nope")
    with pytest.raises(ValueError):
        SK.bloom_contains(None, "v", None, backend="nope")


def test_bloom_join_backend_matches_literal(docs):
    """The past-the-literal-ceiling backend (broadcast equi-joins on
    the sparse word table) must return exactly the literal path's rows
    — hits AND misses — at the same (m, k)."""
    bench = docs.where("doc_id % 7 = 0")
    probe = docs  # includes bench rows, so true hits are exercised
    bs = SK.bloom_bitset(bench, "text", m_bits=6000, k=4)
    for keep in ("hits", "misses"):
        lit = sorted(
            r["doc_id"]
            for r in SK.bloom_contains(
                probe, "text", bs, m_bits=6000, k=4, keep=keep, backend="literal"
            ).collect()
        )
        jn = sorted(
            r["doc_id"]
            for r in SK.bloom_contains(
                probe, "text", bs, m_bits=6000, k=4, keep=keep, backend="join"
            ).collect()
        )
        assert lit == jn and lit


def test_bloom_join_backend_null_semantics(spark):
    members = spark.createDataFrame([("a",), ("b",)], "v: string")
    probe = spark.createDataFrame([("a",), (None,)], "v: string")
    bs = SK.bloom_bitset(members, "v", m_bits=600, k=3)
    hits = SK.bloom_contains(probe, "v", bs, m_bits=600, k=3, keep="hits", backend="join")
    misses = SK.bloom_contains(probe, "v", bs, m_bits=600, k=3, keep="misses", backend="join")
    assert [r["v"] for r in hits.collect()] == ["a"]
    assert [r["v"] for r in misses.collect()] == [None]


def test_bloom_join_backend_probe_shuffle_free(docs):
    """The join backend's probe side must stream through BROADCAST hash
    joins only — no sort-merge join, no shuffle exchange anywhere in
    the probe plan (the bitset build side aggregates, but that frame is
    bounded by m/60 words regardless of corpus size)."""
    bench = docs.where("doc_id % 7 = 0")
    bs = SK.bloom_bitset(bench, "text", m_bits=1 << 23, k=4)
    probed = SK.bloom_contains(docs, "text", bs, m_bits=1 << 23, k=4, backend="join")
    s = probed._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in s
    assert "SortMergeJoin" not in s and "ShuffledHashJoin" not in s


def test_bloom_auto_backend_switches_on_m(spark, monkeypatch):
    """auto must take the join path (no driver collect of the bitset)
    past BLOOM_LITERAL_MAX_BITS, and the literal path below it."""
    members = spark.createDataFrame([("a",)], "v: string")
    probe = spark.createDataFrame([("a",), ("z",)], "v: string")

    def _boom(*_a, **_k):  # pragma: no cover - the assertion target
        raise AssertionError("auto backend compiled a past-ceiling literal")

    big_m = SK.BLOOM_LITERAL_MAX_BITS + 60
    bs_big = SK.bloom_bitset(members, "v", m_bits=big_m, k=2)
    monkeypatch.setattr(SK, "bloom_membership_expr", _boom)
    got = SK.bloom_contains(probe, "v", bs_big, m_bits=big_m, k=2, backend="auto")
    assert [r["v"] for r in got.collect()] == ["a"]

    # below the ceiling auto uses the literal path (hits _boom)
    bs_small = SK.bloom_bitset(members, "v", m_bits=600, k=2)
    with pytest.raises(AssertionError, match="past-ceiling literal"):
        SK.bloom_contains(probe, "v", bs_small, m_bits=600, k=2, backend="auto")


def test_cms_join_size_upper_bounds_exact(spark, events):
    """Inner-product estimate >= true join size; tight at wide width."""
    a = events.select(F.col("user_id").alias("k"))
    b = events.where("event_id % 3 = 0").select(F.col("user_id").alias("k"))
    exact = a.join(b, "k").count()
    ra = SK.cms_registers(a, "k", depth=4, width=4096)
    rb = SK.cms_registers(b, "k", depth=4, width=4096)
    est = SK.cms_join_size_estimate(ra, rb, depth=4).collect()[0]["est_join_rows"]
    assert est >= exact
    assert est <= exact * 1.5 + 100  # wide sketch stays near-exact


def test_cms_join_size_disjoint_is_small(spark):
    a = spark.createDataFrame([(f"a{i}",) for i in range(200)], "k: string")
    b = spark.createDataFrame([(f"b{i}",) for i in range(200)], "k: string")
    ra = SK.cms_registers(a, "k", depth=4, width=4096)
    rb = SK.cms_registers(b, "k", depth=4, width=4096)
    est = SK.cms_join_size_estimate(ra, rb, depth=4).collect()[0]["est_join_rows"]
    assert est <= 200  # only hash-collision noise, no real overlap


def test_hll_grouped_close_to_exact(events):
    exact = {
        r["event_type"]: r["n"]
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    est = {
        r["event_type"]: r["estimate"]
        for r in SK.hll_grouped_cardinality(
            events, ["event_type"], "user_id", p=12
        ).collect()
    }
    assert set(est) == set(exact)
    for k in exact:
        assert est[k] == pytest.approx(exact[k], rel=0.15)


def test_hll_rolling_merges_windows(spark):
    # day 0: users 0-9; day 1: users 5-14; day 2: users 100-104
    rows = (
        [(0, u) for u in range(10)]
        + [(1, u) for u in range(5, 15)]
        + [(2, u) for u in range(100, 105)]
    )
    df = spark.createDataFrame(rows, "day_num: long, user_id: long")
    est = {
        r["day_num"]: r["estimate"]
        for r in SK.hll_rolling_cardinality(
            df, "day_num", "user_id", window_units=2, p=12
        ).collect()
    }
    # window(day d) = days [d-1, d]
    assert est[0] == pytest.approx(10, rel=0.1)     # just day 0
    assert est[1] == pytest.approx(15, rel=0.1)     # 0 u 1 = 15 users
    assert est[2] == pytest.approx(15, rel=0.1)     # 1 u 2 = 15 users
    with pytest.raises(ValueError):
        SK.hll_rolling_cardinality(df, "day_num", "user_id", window_units=0)


# --- HLL pairwise overlap (batch 58) ------------------------------------

def test_hll_pairwise_overlap_inclusion_exclusion(spark):
    # groups: a = {0..199}, b = {100..299} → overlap 100; c disjoint {1000..1049}
    rows = (
        [("a", i) for i in range(200)]
        + [("b", i) for i in range(100, 300)]
        + [("c", i) for i in range(1000, 1050)]
    )
    df = spark.createDataFrame(rows, ["g", "v"])
    out = {(r.g_a, r.g_b): r for r in SK.hll_pairwise_overlap(df, "g", "v", p=12).collect()}
    ab = out[("a", "b")]
    # p=12 on a few hundred values → estimates within a few % of truth
    assert abs(ab.est_overlap - 100) < 10
    assert abs(ab.est_union - 300) < 15
    ac = out[("a", "c")]
    assert ac.est_overlap < 10  # disjoint → near zero (clamped at 0)
    assert ac.est_overlap >= 0.0
    assert len(out) == 3  # all unordered pairs, each once


def test_hll_pairwise_overlap_estimates_match_grouped_cardinality(spark):
    rows = [("x", i) for i in range(500)] + [("y", i % 50) for i in range(300)]
    df = spark.createDataFrame(rows, ["g", "v"])
    single = {
        r.g: r.estimate
        for r in SK.hll_grouped_cardinality(df, ["g"], "v", p=12).collect()
    }
    pair = SK.hll_pairwise_overlap(df, "g", "v", p=12).collect()[0]
    assert pair.est_a == single[pair.g_a]
    assert pair.est_b == single[pair.g_b]
