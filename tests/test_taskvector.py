"""Task-vector algebra tests (SURVEY §2.7) cross-checked against a
plain-Python re-computation of the reference semantics
(``/root/reference/src/utils/merging.py``)."""

import pytest
from pyspark.sql import functions as F

from datas_spark.operators import taskvector as TV


def _long(spark, d):
    """dict {key: [values]} → long table (key, idx, value)."""
    rows = [(k, i, float(v)) for k, vs in d.items() for i, v in enumerate(vs)]
    return spark.createDataFrame(rows, "key string, idx long, value double")


def _to_dict(df):
    out = {}
    for r in df.collect():
        out.setdefault(r.key, {})[r.idx] = r.value
    return out


def test_task_vector_diff(spark):
    ft = _long(spark, {"w": [2.0, 4.0], "b": [1.0]})
    pt = _long(spark, {"w": [1.0, 1.0], "b": [3.0]})
    got = _to_dict(TV.task_vector(ft, pt))
    assert got == {"w": {0: 1.0, 1: 3.0}, "b": {0: -2.0}}


def test_tv_add_and_negate(spark):
    a = _long(spark, {"w": [1.0, 2.0]})
    b = _long(spark, {"w": [10.0, 20.0]})
    assert _to_dict(TV.tv_add(a, b)) == {"w": {0: 11.0, 1: 22.0}}
    assert _to_dict(TV.tv_negate(a)) == {"w": {0: -1.0, 1: -2.0}}


def test_tv_weighted_merge(spark):
    a = _long(spark, {"w": [1.0, 2.0]})
    b = _long(spark, {"w": [10.0, 20.0]})
    got = _to_dict(TV.tv_weighted_merge([a, b], [0.5, 0.1]))
    assert got == {"w": {0: 1.5, 1: 3.0}}


def test_tv_apply_missing_keys_pass_through(spark):
    pt = _long(spark, {"w": [1.0], "extra": [5.0]})
    tv = _long(spark, {"w": [2.0]})
    got = _to_dict(TV.tv_apply(pt, tv, scaling=2.0))
    assert got == {"w": {0: 5.0}, "extra": {0: 5.0}}


def test_ties_topk_keeps_largest_magnitude(spark):
    tv = _long(spark, {"w": [0.1, -5.0, 0.2, 3.0, -0.05]})
    got = _to_dict(TV.ties_topk_mask(tv, k_pct=0.4))  # keep top 2 of 5
    assert got == {"w": {0: 0.0, 1: -5.0, 2: 0.0, 3: 3.0, 4: 0.0}}


def test_ties_merge_mean(spark):
    # two vectors; disagreement on sign at idx1
    a = _long(spark, {"w": [1.0, -2.0]})
    b = _long(spark, {"w": [3.0, 4.0]})
    got = _to_dict(TV.ties_merge([a, b], k_pct=1.0, mode="mean"))
    # idx0: sum=4>0 → mean of agreeing {1,3} = 2; idx1: sum=2>0 → mean of {4} = 4
    assert got == {"w": {0: 2.0, 1: 4.0}}


def test_ties_merge_modes(spark):
    a = _long(spark, {"w": [1.0]})
    b = _long(spark, {"w": [3.0]})
    assert _to_dict(TV.ties_merge([a, b], 1.0, "sum")) == {"w": {0: 4.0}}
    assert _to_dict(TV.ties_merge([a, b], 1.0, "max")) == {"w": {0: 3.0}}
    with pytest.raises(ValueError):
        TV.ties_disjoint_merge(_long(spark, {"w": [1.0]}), _long(spark, {"w": [1.0]}), "bogus")


def test_ties_global_topk_spans_keys(spark):
    # per-key top-1: each key keeps its own largest; global top-20% of
    # 10 entries keeps only the 2 largest magnitudes ACROSS keys
    tv = _long(spark, {"a": [9.0, 0.1, 0.2, 0.3, 0.4], "b": [8.0, 0.1, 0.2, 0.3, 0.4]})
    per_key = _to_dict(TV.ties_topk_mask(tv, k_pct=0.2))
    glob = _to_dict(TV.ties_topk_mask(tv, k_pct=0.2, global_topk=True))
    assert per_key["a"][0] == 9.0 and per_key["b"][0] == 8.0
    assert glob == {
        "a": {0: 9.0, 1: 0.0, 2: 0.0, 3: 0.0, 4: 0.0},
        "b": {0: 8.0, 1: 0.0, 2: 0.0, 3: 0.0, 4: 0.0},
    }


def test_ties_merge_global_topk(spark):
    # global mask keeps top-50% of each 4-entry vector: a keeps {4,-3},
    # b keeps {5, 2} — then disjoint-mean merges per entry
    a = _long(spark, {"w": [4.0, -3.0], "v": [1.0, 0.5]})
    b = _long(spark, {"w": [5.0, 0.1], "v": [2.0, 0.2]})
    got = _to_dict(TV.ties_merge([a, b], k_pct=0.5, mode="mean", global_topk=True))
    # w0: 4,5 agree + → 4.5; w1: -3 masked-b → sign − → -3
    # v0: masked-a, 2 → 2; v1: both masked → sign 0 → mass fallback +1 → 0
    assert got == {"w": {0: 4.5, 1: -3.0}, "v": {0: 2.0, 1: 0.0}}


def test_ties_sign_methods(spark):
    # idx0 sums to zero → mass inherits majority (+), minority its negation
    a = _long(spark, {"w": [1.0, 5.0]})
    b = _long(spark, {"w": [-1.0, 2.0]})
    tagged = TV.ties_topk_mask(a, 1.0).withColumn("vector_id", F.lit(0)).unionByName(
        TV.ties_topk_mask(b, 1.0).withColumn("vector_id", F.lit(1))
    )
    mass = {r.idx: r.sign for r in TV.ties_elect_sign(tagged).collect()}
    mino = {r.idx: r.sign for r in TV.ties_elect_sign(tagged, "minority").collect()}
    assert mass == {0: 1.0, 1: 1.0}
    assert mino == {0: -1.0, 1: 1.0}
    # through the fused driver: minority keeps the NEGATIVE side at idx0
    got = _to_dict(TV.ties_merge([a, b], k_pct=1.0, mode="mean", sign_method="minority"))
    assert got == {"w": {0: -1.0, 1: 3.5}}
    with pytest.raises(ValueError):
        TV.ties_merge([a, b], k_pct=1.0, sign_method="bogus")


def test_key_symmetric_difference(spark):
    a = _long(spark, {"w": [1.0], "only_a": [1.0]})
    b = _long(spark, {"w": [1.0], "only_b": [1.0]})
    got = {(r.key, r.side) for r in TV.key_symmetric_difference(a, b).collect()}
    assert got == {("only_a", "a"), ("only_b", "b")}


# --- merging diagnostics + DARE (batch 66) ------------------------------

def test_tv_cosine_by_key_aligned_and_opposed(spark):
    a = spark.createDataFrame(
        [("l1", 0, 1.0), ("l1", 1, 2.0), ("l2", 0, 1.0), ("l2", 1, 0.0)],
        ["key", "idx", "value"],
    )
    b = spark.createDataFrame(
        [("l1", 0, 2.0), ("l1", 1, 4.0), ("l2", 0, -1.0), ("l2", 1, 0.0)],
        ["key", "idx", "value"],
    )
    got = {r.key: r.cos for r in TV.tv_cosine_by_key(a, b).collect()}
    assert got["l1"] == 1.0      # parallel
    assert got["l2"] == -1.0     # anti-aligned


def test_tv_cosine_zero_norm_is_null(spark):
    a = spark.createDataFrame([("l", 0, 0.0)], ["key", "idx", "value"])
    b = spark.createDataFrame([("l", 0, 5.0)], ["key", "idx", "value"])
    assert TV.tv_cosine_by_key(a, b).collect()[0].cos is None


def test_dare_drop_rescale_unbiased_and_deterministic(spark):
    tv = spark.createDataFrame(
        [("k", i, 1.0) for i in range(2000)], ["key", "idx", "value"]
    )
    kept1 = TV.dare_drop_rescale(tv, p=0.9).collect()
    kept2 = TV.dare_drop_rescale(tv, p=0.9).collect()
    assert sorted(map(tuple, kept1)) == sorted(map(tuple, kept2))
    # ~10% survive, each rescaled to 10.0 → expected total ≈ 2000
    n = len(kept1)
    assert 120 <= n <= 280
    assert all(abs(r.value - 10.0) < 1e-9 for r in kept1)
    total = sum(r.value for r in kept1)
    assert abs(total - 2000) / 2000 < 0.45


def test_dare_validates_p(spark):
    tv = spark.createDataFrame([("k", 0, 1.0)], ["key", "idx", "value"])
    import pytest as _pytest
    with _pytest.raises(ValueError):
        TV.dare_drop_rescale(tv, p=1.0)


def test_fisher_uniform_reduces_to_weighted_merge(spark):
    """Matena-Raffel with a CONSTANT Fisher must equal T4's plain
    weighted merge with normalized coefficients — the property that
    pins the estimator's algebra."""
    m1 = spark.createDataFrame(
        [("k", i, float(i)) for i in range(8)], ["key", "idx", "value"]
    )
    m2 = spark.createDataFrame(
        [("k", i, float(2 * i + 1)) for i in range(8)], ["key", "idx", "value"]
    )
    uni = spark.createDataFrame(
        [("k", i, 3.5) for i in range(8)], ["key", "idx", "fisher"]
    )
    got = {
        (r.key, r.idx): r.value
        for r in TV.fisher_weighted_merge(
            [m1, m2], [uni, uni], coefs=[0.6, 0.4]
        ).collect()
    }
    want = {
        (r.key, r.idx): r.value
        for r in TV.tv_weighted_merge(
            [m1, m2], [0.6 / 1.0, 0.4 / 1.0]
        ).collect()
    }
    for k in want:
        assert abs(got[k] - want[k]) < 1e-9, (k, got[k], want[k])


def test_fisher_weighting_prefers_certain_model(spark):
    """A parameter where model A's Fisher dwarfs B's must land near
    A's value; zero Fisher on both sides yields NULL, not div0."""
    mA = spark.createDataFrame([("k", 0, 10.0), ("k", 1, 10.0)],
                               ["key", "idx", "value"])
    mB = spark.createDataFrame([("k", 0, -10.0), ("k", 1, -10.0)],
                               ["key", "idx", "value"])
    fA = spark.createDataFrame([("k", 0, 99.0), ("k", 1, 0.0)],
                               ["key", "idx", "fisher"])
    fB = spark.createDataFrame([("k", 0, 1.0), ("k", 1, 0.0)],
                               ["key", "idx", "fisher"])
    out = {r.idx: r.value
           for r in TV.fisher_weighted_merge([mA, mB], [fA, fB]).collect()}
    assert out[0] > 9.0  # 99:1 certainty ratio pulls to A
    assert out[1] is None  # both indifferent -> NULL


def test_fisher_from_grads_exact_moments(spark):
    from datas_spark.operators.taskvector import fisher_from_grads

    g = spark.createDataFrame(
        [(1, "k", 0, 1.0), (2, "k", 0, -3.0), (3, "k", 0, 2.0)],
        ["id", "key", "idx", "value"],
    )
    r = fisher_from_grads(g).collect()[0]
    assert abs(r.fisher - (1 + 9 + 4) / 3) < 1e-9


def test_fisher_merge_validates_shapes(spark):
    import pytest as _pytest

    m = spark.createDataFrame([("k", 0, 1.0)], ["key", "idx", "value"])
    f = spark.createDataFrame([("k", 0, 1.0)], ["key", "idx", "fisher"])
    with _pytest.raises(ValueError):
        TV.fisher_weighted_merge([m], [f, f])
    with _pytest.raises(ValueError):
        TV.fisher_weighted_merge([], [])
    with _pytest.raises(ValueError):
        TV.fisher_weighted_merge([m], [f], coefs=[1.0, 2.0])


# ---------------------------------------------------------------------------
# round 10: SLERP checkpoint interpolation
# ---------------------------------------------------------------------------


def _two_ckpts(spark):
    a = spark.createDataFrame(
        [("l0", 0, 1.0), ("l0", 1, 0.0), ("l1", 0, 2.0), ("l1", 1, 2.0)],
        "key string, idx long, value double",
    )
    b = spark.createDataFrame(
        [("l0", 0, 0.0), ("l0", 1, 1.0), ("l1", 0, 4.0), ("l1", 1, 4.0)],
        "key string, idx long, value double",
    )
    return a, b


def test_slerp_endpoints_equal_inputs(spark):
    from datas_spark.operators.taskvector import slerp_merge

    a, b = _two_ckpts(spark)
    at0 = {(r.key, r.idx): r.value for r in slerp_merge(a, b, t=0.0).collect()}
    at1 = {(r.key, r.idx): r.value for r in slerp_merge(a, b, t=1.0).collect()}
    av = {(r.key, r.idx): r.value for r in a.collect()}
    bv = {(r.key, r.idx): r.value for r in b.collect()}
    assert at0 == av
    assert at1 == bv


def test_slerp_collinear_layer_falls_back_to_lerp(spark):
    """l1's vectors are parallel (b = 2a): omega = 0, sin = 0 -> lerp
    weights (1-t, t); l0's are orthogonal -> true spherical weights
    sin((1-t)*pi/2), sin(t*pi/2) and the result keeps unit norm."""
    import math

    from datas_spark.operators.taskvector import slerp_merge

    a, b = _two_ckpts(spark)
    got = {(r.key, r.idx): r.value for r in slerp_merge(a, b, t=0.5).collect()}
    # collinear layer: plain midpoint
    assert abs(got[("l1", 0)] - 3.0) < 1e-9
    assert abs(got[("l1", 1)] - 3.0) < 1e-9
    # orthogonal layer: w = sin(pi/4)/sin(pi/2) = sqrt(2)/2 on both ends
    w = math.sin(math.pi / 4)
    assert abs(got[("l0", 0)] - w) < 1e-9
    assert abs(got[("l0", 1)] - w) < 1e-9
    norm = math.hypot(got[("l0", 0)], got[("l0", 1)])
    assert abs(norm - 1.0) < 1e-6  # SLERP preserves the unit norm


def test_slerp_validates_t(spark):
    import pytest as _pytest

    from datas_spark.operators.taskvector import slerp_merge

    a, b = _two_ckpts(spark)
    with _pytest.raises(ValueError):
        slerp_merge(a, b, t=1.5)
