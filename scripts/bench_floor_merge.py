"""Min-merge a fresh bench run into the committed per-query floors —
in NORMALIZED space (VERDICT r7 "Next round" #3).

The committed BENCH_DETAIL.json keeps each query's best-measured time
as a regression floor. Sessions run on different box regimes (this box
swings 2-6x), so comparing raw seconds across sessions is meaningless:
a floor from a fast session paired with a canary total from a slow one
makes the gate's numerator and denominator disagree about how fast the
box was. The invariant this tool maintains:

    every floor is stored with the SCAN canary total of the session
    that measured it (``floor_canary[query]``), and floors are
    compared across sessions in normalized space:
    ``raw_seconds / session_scan_canary_total``.

For each query the candidate with the smaller normalized value wins,
and its RAW seconds plus ITS session's canary land in the merged map —
bench_diff.py then normalizes each query by its own floor canary, so
both sides of the gate always share a box regime.

Round-9: the new side's per-query canary is the drift-EFFECTIVE one
(session scan total x the drift probe nearest the query's run position,
bench_diff.drift_factor) — a floor measured in a mid-session slow phase
carries that phase's canary, and this tool is the ONLY writer of
BENCH_DETAIL.json: bench.py writes raw session output to BENCH_RUN.json
(VERDICT r8 "What's wrong" #1 — a bench run used to clobber the
committed floors doc, dropping every floor_canary).

Usage:
    python scripts/bench_floor_merge.py            # HEAD floors + BENCH_RUN.json -> BENCH_DETAIL.json
    python scripts/bench_floor_merge.py OLD NEW    # explicit files -> stdout path arg 3
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench_diff import canary_info, drift_factor  # noqa: E402


def merge(old_doc: dict, new_doc: dict) -> dict:
    """Pure merge core: returns the merged BENCH_DETAIL document.

    The merged doc carries the NEW session's canary block (it describes
    the latest run) and a ``floor_canary`` map giving, per query, the
    scan canary total of the session whose raw floor was kept. Queries
    missing a floor_canary entry on the old side fall back to the old
    document's own scan total (the pre-round-8 situation: one canary
    for the whole map)."""
    oc, nc = canary_info(old_doc), canary_info(new_doc)
    if not nc:
        raise SystemExit("new run has no canary block — re-run bench.py")
    if oc and oc["set"] != nc["set"]:
        raise SystemExit(
            f"canary sets differ (old {oc['set']} vs new {nc['set']}) — "
            f"floors cannot be merged across mismatched canary sets"
        )
    old_q = {k: float(v) for k, v in old_doc.get("queries", {}).items()}
    new_q = {k: float(v) for k, v in new_doc.get("queries", {}).items()}
    old_fc = old_doc.get("floor_canary") or {}
    old_scan = oc["scan"] if oc else None

    merged: dict[str, float] = {}
    floor_canary: dict[str, float] = {}
    for name in sorted(set(old_q) | set(new_q)):
        cands = []
        if name in old_q:
            fc = float(old_fc.get(name, old_scan or nc["scan"]))
            cands.append((old_q[name] / fc, old_q[name], fc))
        if name in new_q:
            # drift-effective canary: the session scan total re-priced
            # to the box phase this query's run position saw (1.0 on
            # docs without drift_index)
            dfac = drift_factor(new_doc, name)
            # drift-spike guard (round 11): when the probe claims the
            # block ran >1.5x slow, a near-normal raw time in it would
            # set a normalized floor no real session can meet (the r10
            # driver session planted 19 such phantom floors at
            # drift 2.3x — every one re-flagged CONFIRMED by fresh-JVM
            # triage a round later). Probe-spiked blocks are evidence
            # for TRIAGE, not for floor-setting — skip adoption.
            if dfac <= 1.5:
                eff = nc["scan"] * dfac
                cands.append((new_q[name] / eff, new_q[name], eff))
        if not cands:
            # new-only query measured in a drift-spiked block: keep the
            # raw measurement (no floor existed to corrupt)
            eff = nc["scan"] * drift_factor(new_doc, name)
            cands.append((new_q[name] / eff, new_q[name], eff))
        _, raw, fc = min(cands)
        merged[name] = raw
        floor_canary[name] = round(fc, 3)

    out = dict(new_doc)
    out["queries"] = merged
    out["floor_canary"] = floor_canary
    out["value"] = round(sum(merged.values()), 3)
    out["n_queries"] = len(merged)
    return out


def main() -> int:
    if len(sys.argv) > 2:
        with open(sys.argv[1]) as fh:
            old_doc = json.load(fh)
        with open(sys.argv[2]) as fh:
            new_doc = json.load(fh)
        dest = sys.argv[3] if len(sys.argv) > 3 else os.path.join(REPO, "BENCH_DETAIL.json")
    else:
        raw = subprocess.run(
            ["git", "-C", REPO, "show", "HEAD:BENCH_DETAIL.json"],
            capture_output=True, text=True, check=True,
        ).stdout
        old_doc = json.loads(raw)
        dest = os.path.join(REPO, "BENCH_DETAIL.json")
        run = os.path.join(REPO, "BENCH_RUN.json")
        src = run if os.path.exists(run) else dest
        with open(src) as fh:
            new_doc = json.load(fh)
    out = merge(old_doc, new_doc)
    kept_old = sum(
        1 for q in out["queries"]
        if q in old_doc.get("queries", {})
        and out["queries"][q] == float(old_doc["queries"][q])
    )
    with open(dest, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    print(
        f"merged {out['n_queries']} floors -> {dest} "
        f"({kept_old} kept from old, {out['n_queries'] - kept_old} from new run)"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
