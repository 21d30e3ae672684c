"""Mechanical canary freeze (VERDICT r7 "Next round" #4): the bench
canary protocol is only valid while the five canary queries' physical
plans never change — their timings measure the BOX, and bench_diff
normalizes every gated query by them. This snapshot test fails if any
canary query's plan SHAPE (ordered physical node list + per-scan
pushed filters and read schema) drifts from the committed fingerprint.

A DELIBERATE canary change must (1) regenerate the snapshot —
``UPDATE_CANARY_PLANS=1 pytest tests/test_canary_plans.py`` — and
(2) re-base the committed BENCH_DETAIL.json floors in the same commit,
because floors normalized by the old canary are not comparable to runs
normalized by the new one (scripts/bench_floor_merge.py refuses
mismatched canary SETS; this test is the same guard for plan shape)."""

import json
import os

SNAPSHOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "canary_plans.json")


def _fingerprint(df):
    from datas_spark.plans.audit import scan_info, walk_plan

    root = df._jdf.queryExecution().executedPlan()
    return {
        "nodes": [nd.getClass().getSimpleName() for nd in walk_plan(root)],
        "scans": scan_info(df),
    }


def test_canary_plans_frozen(spark, sf_dir):
    import bench
    from datas_spark.registry import QUERIES

    got = {
        name: _fingerprint(QUERIES[name](spark, sf_dir))
        for name in bench.CANARY_QUERIES
    }
    if os.environ.get("UPDATE_CANARY_PLANS"):
        with open(SNAPSHOT, "w") as fh:
            json.dump(got, fh, indent=1, sort_keys=True)
    with open(SNAPSHOT) as fh:
        want = json.load(fh)
    assert sorted(want) == sorted(got), (
        "canary query set changed — update the snapshot AND re-base "
        "the bench floors in the same commit"
    )
    for name in want:
        assert got[name] == want[name], (
            f"canary query '{name}' physical plan drifted:\n"
            f"  committed: {want[name]}\n  current:   {got[name]}\n"
            "canary plans are frozen — if this change is deliberate, "
            "regenerate with UPDATE_CANARY_PLANS=1 and re-base floors"
        )
