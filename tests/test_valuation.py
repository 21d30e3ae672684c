"""KNN-Shapley data valuation: the closed-form recursion must equal
the Shapley definition (exponential subset enumeration) exactly, and
the efficiency property must hold per test point."""

from itertools import combinations

import pytest
from pyspark.sql import functions as F

from datas_spark.operators import valuation as V

K = 2

# 6 train points on a line (1-d embeddings padded to 2-d), 2 classes.
# Small enough to enumerate all 2^6 subsets exactly.
TRAIN = [
    # (id, vec, label)
    (10, [1.0, 0.0], 1),
    (11, [2.0, 0.0], 0),
    (12, [3.0, 0.0], 1),
    (13, [5.0, 0.0], 1),
    (14, [8.0, 0.0], 0),
    (15, [13.0, 0.0], 0),
]
TESTS = [
    (0, [0.0, 0.0], 1),
    (1, [9.0, 0.0], 0),
    (2, [4.0, 0.0], 0),
]


def _utility(subset, test_vec, test_label, k=K):
    """K-NN utility of a training subset for one test point: fraction
    of the up-to-K nearest subset members whose label matches."""
    if not subset:
        return 0.0
    ranked = sorted(
        subset,
        key=lambda p: (sum((a - b) ** 2 for a, b in zip(p[1], test_vec)), p[0]),
    )
    top = ranked[: min(k, len(ranked))]
    return sum(1 for p in top if p[2] == test_label) / k


def _brute_shapley(test_vec, test_label):
    """Exact Shapley by definition: average marginal contribution over
    all orderings, via the subset-weighted form."""
    import math

    n = len(TRAIN)
    vals = {}
    for point in TRAIN:
        others = [p for p in TRAIN if p[0] != point[0]]
        total = 0.0
        for r in range(n):
            for sub in combinations(others, r):
                w = math.factorial(r) * math.factorial(n - r - 1) / math.factorial(n)
                total += w * (
                    _utility(list(sub) + [point], test_vec, test_label)
                    - _utility(list(sub), test_vec, test_label)
                )
        vals[point[0]] = total
    return vals


@pytest.fixture(scope="module")
def frames(spark):
    train = spark.createDataFrame(
        [(i, v, l) for i, v, l in TRAIN], "vec_id long, embedding array<float>, label int"
    )
    test = spark.createDataFrame(
        [(i, v, l) for i, v, l in TESTS], "vec_id long, embedding array<float>, label int"
    )
    return train, test


def test_matches_brute_force_enumeration(spark, frames):
    train, test = frames
    pairs = V.knn_shapley_pairs(train, test, "vec_id", "embedding", "label", k=K)
    got = {
        (r["test_id"], r["train_id"]): r["shapley"] for r in pairs.collect()
    }
    for tid, tvec, tlab in TESTS:
        want = _brute_shapley(tvec, tlab)
        for train_id, w in want.items():
            assert got[(tid, train_id)] == pytest.approx(w, abs=1e-7), (
                tid,
                train_id,
            )


def test_efficiency_property(spark, frames):
    """sum_i shapley(t, i) == utility of the FULL train set for t."""
    train, test = frames
    pairs = V.knn_shapley_pairs(train, test, "vec_id", "embedding", "label", k=K)
    sums = {
        r["test_id"]: r["s"]
        for r in pairs.groupBy("test_id").agg(F.sum("shapley").alias("s")).collect()
    }
    for tid, tvec, tlab in TESTS:
        assert sums[tid] == pytest.approx(
            _utility(TRAIN, tvec, tlab), abs=1e-7
        ), tid


def test_values_are_mean_over_tests(spark, frames):
    train, test = frames
    pairs = V.knn_shapley_pairs(train, test, "vec_id", "embedding", "label", k=K)
    vals = V.knn_shapley_values(train, test, "vec_id", "embedding", "label", k=K)
    by_train = {
        r["train_id"]: r["m"]
        for r in pairs.groupBy("train_id").agg(F.avg("shapley").alias("m")).collect()
    }
    for r in vals.collect():
        assert r["n_tests"] == len(TESTS)
        assert r["value"] == pytest.approx(by_train[r["train_id"]], abs=1e-6)


def test_harmful_point_gets_negative_value(spark, frames):
    """A training point whose label disagrees with every nearby test
    point must value negative (the mislabel-detection contract)."""
    train, test = frames
    vals = {
        r["train_id"]: r["value"]
        for r in V.knn_shapley_values(
            train, test, "vec_id", "embedding", "label", k=K
        ).collect()
    }
    # train 12 (label 1 at x=3) sits closest to test 2 (label 0 at x=4)
    # and near test 0's neighborhood competitors; brute force confirms
    # its mean value is negative.
    assert vals[12] < 0


def test_no_raw_row_window_partitioned_only_by_test_id(spark, frames):
    """VERDICT r6 #2 done-criterion: the per-probe ranking must never
    flow a probe's whole training set through one task. Every window
    over raw rows partitions by (__pid, test_id); any window whose
    partition spec is test_id alone may exist only above an aggregate
    (the tiny per-segment carry frame)."""
    from datas_spark.plans.audit import _has_aggregate_below, _root, walk_plan

    train, test = frames
    df = V.knn_shapley_pairs(train, test, "vec_id", "embedding", "label", k=K)
    saw_window = False
    for nd in walk_plan(_root(df)):
        if nd.getClass().getSimpleName() not in ("WindowExec", "WindowGroupLimitExec"):
            continue
        saw_window = True
        spec = nd.partitionSpec()
        names = [
            str(spec.apply(i).toString()).split("#")[0]
            for i in range(spec.length())
        ]
        if names == ["test_id"]:
            assert _has_aggregate_below(nd), (
                "raw-row window partitioned solely by test_id: " + str(names)
            )
    assert saw_window
