from datas_spark.operators import training as T


def test_next_event_examples_windows_and_order(spark):
    rows = [
        ("u1", 1, "a"),
        ("u1", 2, "b"),
        ("u1", 3, "c"),
        ("u1", 4, "d"),
        ("u2", 1, "x"),
    ]
    df = spark.createDataFrame(rows, ["user", "t", "item"])
    out = T.next_event_examples(df, "user", "t", "item", seq_len=2, tiebreak_col="t")
    got = {(r.user, r.t): (list(r.history), r.label) for r in out.collect()}
    # first event per user has no history → dropped (u2 emits nothing)
    assert ("u1", 1) not in got and ("u2", 1) not in got
    assert got[("u1", 2)] == (["a"], "b")
    assert got[("u1", 3)] == (["a", "b"], "c")
    # frame is row-bounded at seq_len=2: "a" ages out
    assert got[("u1", 4)] == (["b", "c"], "d")
    assert len(got) == 3


def test_next_event_examples_tiebreak_is_deterministic(spark):
    rows = [("u", 1, 1, "a"), ("u", 1, 2, "b"), ("u", 1, 3, "c")]
    df = spark.createDataFrame(rows, ["user", "t", "eid", "item"])
    out = T.next_event_examples(df, "user", "t", "item", seq_len=3, tiebreak_col="eid")
    got = {r.eid: list(r.history) for r in out.collect()}
    assert got == {2: ["a"], 3: ["a", "b"]}


def test_negative_sample_excludes_positives_and_is_deterministic(spark):
    rows = [(u, i) for u in ("u1", "u2", "u3") for i in (1, 2, 3)] + [
        ("u1", 4),
        ("u2", 5),
    ]
    df = spark.createDataFrame(rows, ["user", "item"])
    out1 = T.negative_sample(df, "user", "item", k=2, oversample=8).collect()
    out2 = T.negative_sample(df, "user", "item", k=2, oversample=8).collect()
    assert sorted(map(tuple, out1)) == sorted(map(tuple, out2))
    pos = set(map(tuple, rows))
    items = {i for _, i in rows}
    per_user = {}
    for r in out1:
        assert (r.user, r.item) not in pos          # never a positive
        assert r.item in items                      # drawn from the catalog
        per_user.setdefault(r.user, []).append(r.slot)
    for u, slots in per_user.items():
        assert len(slots) <= 2
        assert slots == sorted(slots)


def test_negative_sample_respects_k_cap(spark):
    # one user interacted with 1 of 10 items: plenty of negatives exist
    rows = [("u", 0)] + [("filler", i) for i in range(10)]
    df = spark.createDataFrame(rows, ["user", "item"])
    out = [r for r in T.negative_sample(df, "user", "item", k=3, oversample=8).collect()
           if r.user == "u"]
    assert len(out) == 3
    assert all(r.item != 0 for r in out)


# ---------------------------------------------------------------------------
# round 6: balanced shards
# ---------------------------------------------------------------------------


def test_balanced_shards_near_equal_mass(spark):
    import random

    from datas_spark.operators.training import balanced_shards

    rng = random.Random(23)
    rows = [(i, rng.randint(100, 5000)) for i in range(400)]
    df = spark.createDataFrame(rows, "id long, toks long")
    got = balanced_shards(df, "id", "toks", n_shards=8).collect()
    assert len(got) == 400
    totals = {}
    for r in got:
        totals[r["shard"]] = totals.get(r["shard"], 0) + r["toks"]
    assert set(totals) == set(range(8))
    # snake bound: imbalance within one largest item of perfect
    assert max(totals.values()) - min(totals.values()) <= 5000


def test_balanced_shards_deterministic_and_guard(spark):
    import pytest as _pytest

    from datas_spark.operators.training import balanced_shards

    rows = [(i, 10 * (i % 7) + 1) for i in range(50)]
    df = spark.createDataFrame(rows, "id long, toks long")
    a = {r["id"]: r["shard"] for r in balanced_shards(df, "id", "toks", 4).collect()}
    b = {r["id"]: r["shard"] for r in balanced_shards(df, "id", "toks", 4).collect()}
    assert a == b
    with _pytest.raises(ValueError):
        balanced_shards(df, "id", "toks", 0)


def test_preference_pairs_margin_ties_and_quota(spark):
    """Planted cases for every preference_pairs rule: deterministic
    tie-breaks on both elections, margin exclusion (no pair rather
    than a noisy pair), hardest-negative selection, per-source quota."""
    from datas_spark.operators.training import preference_pairs

    rows = [
        # prompt 1: tie at top (ids 11 vs 10 -> chosen=10), rejected
        # candidates 5.0 and 4.0 with margin 3 -> hardest negative 5.0
        (1, 10, 9.0, "a"),
        (1, 11, 9.0, "a"),
        (1, 12, 5.0, "a"),
        (1, 13, 4.0, "a"),
        # prompt 2: best gap (8-6=2) below margin 3 -> NO pair
        (2, 20, 8.0, "a"),
        (2, 21, 6.0, "a"),
        # prompt 3: exactly-margin gap qualifies (<=), rejected ties
        # break to the lower id
        (3, 30, 7.0, "b"),
        (3, 31, 4.0, "b"),
        (3, 32, 4.0, "b"),
        # prompt 4: single response -> no partner, no pair
        (4, 40, 9.5, "b"),
        # prompts 5-6: same source as 3, quota=2 keeps the two pairs
        # with the highest chosen_score (7.0 and 6.5, drops 6.0)
        (5, 50, 6.5, "b"),
        (5, 51, 1.0, "b"),
        (6, 60, 6.0, "b"),
        (6, 61, 1.0, "b"),
    ]
    df = spark.createDataFrame(
        rows, "prompt_id long, response_id long, score double, source string"
    )
    out = {
        r.prompt_id: r
        for r in preference_pairs(
            df, "prompt_id", "response_id", "score",
            margin=3.0, source_col="source", per_source_quota=2,
        ).collect()
    }
    assert set(out) == {1, 3, 5}
    assert (out[1].chosen_id, out[1].rejected_id) == (10, 12)
    assert out[1].rejected_score == 5.0  # hardest negative, not 4.0
    assert (out[3].chosen_id, out[3].rejected_id) == (30, 31)  # tie -> low id
    assert (out[5].chosen_id, out[5].rejected_id) == (50, 51)
    # quota requires a source column
    import pytest as _pytest
    with _pytest.raises(ValueError):
        preference_pairs(
            df, "prompt_id", "response_id", "score",
            margin=1.0, per_source_quota=2,
        )
