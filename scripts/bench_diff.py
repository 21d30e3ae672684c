"""Bench regression gate: diff two BENCH_DETAIL.json per-query timing
maps and FAIL (exit 1) on any regression worse than ``new_adj > old *
1.5 + 0.3 s`` — the same per-query criterion the round judgments apply
by hand. Wired into the round-closing recipe (.claude/skills/verify) so
a plan regression like round 3's 58x gram blow-up is un-shippable: the
bench must be re-run and diffed before BENCH_DETAIL.json is committed.

Canary normalization (round-7): identical workloads measured 110-194 s
across same-day runs on this box — per-query variance of 2-6x defeats
any fixed ratio gate. bench.py therefore times five frozen map-only
canary queries plus a pure-JVM ``spark.range`` sentinel in every run
and records them under ``canary`` in BENCH_DETAIL.json. Here, every
NEW timing is divided by the canary ratio (clamped to [0.25, 4])
before the gate applies — so a uniformly-slow box cancels out and only
per-query PLAN changes flag.

Round-8 refinements (VERDICT r7 #3, ADVICE r7):

- **Normalized-space floors.** The committed BENCH_DETAIL.json is a
  per-query FLOOR map min-merged across sessions
  (scripts/bench_floor_merge.py). Sessions have different box speeds,
  so raw-space min-merge would pair a fast-box floor with a slow-box
  canary total and mis-gate. Invariant: every floor carries the SCAN
  canary total of the session that set it (top-level ``floor_canary``
  map; absent entries fall back to the document's own canary), and the
  gate normalizes each query by ITS floor's canary —
  ``new_adj = new_raw / clamp(new_scan_total / floor_canary[q])`` —
  so numerator and denominator always come from the same box regime.
- **Sentinel vs scan divergence.** The pure-JVM range sentinel is
  code-independent; the five scan canaries share the parquet-scan
  path with every gated query. Their ratios are computed SEPARATELY:
  normalization uses the scan ratio (scan slowness, whatever its
  cause, affects gated queries identically), but when the two ratios
  diverge >2x a WARNING is printed — "scan canaries slowed, CPU
  sentinel flat" is either a slow-I/O box phase or a code regression
  in shared scan/session infrastructure, and only a fresh-JVM canary
  spot check can tell them apart. The warning is not a failure
  because this box demonstrably HAS slow-I/O phases (round-7 floors
  were inflated 5-20x by one), but it must be triaged in the commit.
- **Canary-set guard.** Normalization is REFUSED (ratio 1.0 + warning)
  when the two sides' canary query sets differ — totals over different
  sets are not comparable.

Round-9 refinements (VERDICT r8 "Next round" #1/#2):

- **Drift-aware normalization.** The session-start canaries miss
  mid-session box phases: the r8 driver session's own drift probe (one
  single-shot token_count every 20 queries) swung ~2x within the run
  and produced 2 false flags that fresh-JVM triage cleared. bench.py
  now records ``canary.drift_index`` (query -> nearest probe by run
  position); here each NEW timing is normalized by an EFFECTIVE scan
  total — ``scan_total * drift[idx(q)] / drift[0]`` — so a query
  measured during a slow phase is compared at that phase's box speed,
  not the session start's.
- **BENCH_RUN.json.** bench.py writes its raw session output to
  BENCH_RUN.json; the committed BENCH_DETAIL.json floors doc is written
  only by bench_floor_merge.py. The default NEW side here is
  BENCH_RUN.json when it exists (falling back to BENCH_DETAIL.json for
  pre-round-9 layouts).

Round-10 refinement (VERDICT r9 "Next round" #6 — auto-triage):

- **--triage.** This box produces double-digit ENVIRONMENTAL flags per
  session (r9: 18/18 false); the manual fresh-JVM bench_triage pass was
  the bottleneck protocol step. ``--triage`` automates it: when the
  gate fails, the flagged queries are re-measured median-of-3 in a
  FRESH JVM (scripts/bench_triage.py, canaries in-session), each flag
  is re-judged against its floor at the triage session's box speed
  (``med / clamp(triage_scan / floor_canary[q])``), a ``triage`` block
  is stamped into BENCH_RUN.json ({queries, scan_total, cleared,
  confirmed}), and the exit code is 0 iff every flag cleared. A triage
  block already covering all flagged queries (e.g. stamped by a prior
  run) is reused instead of re-measuring.

Usage:
    python scripts/bench_diff.py                    # HEAD floors vs BENCH_RUN.json
    python scripts/bench_diff.py --triage           # + fresh-JVM re-judge of flags
    python scripts/bench_diff.py OLD.json NEW.json  # explicit files

With no arguments the OLD side is the last committed BENCH_DETAIL.json
(``git show HEAD:BENCH_DETAIL.json``) and the NEW side is the working
tree BENCH_RUN.json. Added/removed queries are reported but never fail
the gate (new queries have no baseline; removals are a registry
decision the oracle gate polices).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# regression iff new_adj > old * RATIO + SLACK_S — the ratio catches
# real plan changes on slow queries, the additive slack mutes timer
# noise on sub-100ms ones (where 1.5x is well inside box jitter)
RATIO = 1.5
SLACK_S = 0.3
# canary ratio clamp: outside this range the canaries themselves moved
# suspiciously (a frozen-plan query regressed?) — trust it only so far
CANARY_CLAMP = (0.25, 4.0)
# sentinel-vs-scan ratio divergence past this factor draws a warning
DIVERGENCE = 2.0


def _load(source: str) -> dict:
    if source == "HEAD":
        raw = subprocess.run(
            ["git", "-C", REPO, "show", "HEAD:BENCH_DETAIL.json"],
            capture_output=True, text=True, check=True,
        ).stdout
        return json.loads(raw)
    with open(source) as fh:
        return json.load(fh)


def _queries(doc: dict) -> dict[str, float]:
    queries = doc.get("queries", doc)
    return {k: float(v) for k, v in queries.items()}


def canary_info(doc: dict) -> dict | None:
    """Normalize a document's canary block: scan total (pre-round-8
    docs only recorded scan+sentinel under "total" — subtract the
    sentinel when present), the sentinel, and the canary query set."""
    c = doc.get("canary") if isinstance(doc, dict) else None
    if not isinstance(c, dict) or not c.get("total"):
        return None
    sentinel = c.get("range_sentinel_s")
    if c.get("scan_total"):
        scan = float(c["scan_total"])
    else:
        scan = float(c["total"]) - float(sentinel or 0.0)
    qset = c.get("set") or sorted(c.get("queries", {}))
    return {
        "scan": scan,
        "sentinel": float(sentinel) if sentinel else None,
        "set": list(qset),
    }


def _clamp(r: float) -> float:
    return max(CANARY_CLAMP[0], min(CANARY_CLAMP[1], r))


def drift_factor(doc: dict, name: str) -> float:
    """Box-speed factor at the run position where ``name`` was measured,
    relative to session start: ``drift_probe[idx(name)] / drift_probe[0]``
    (1.0 when the doc predates drift_index or the probe is unusable).
    Multiplying the session scan total by this gives the EFFECTIVE
    canary for that query — the session-start canaries re-priced to the
    box phase the query actually ran in."""
    c = doc.get("canary") if isinstance(doc, dict) else None
    if not isinstance(c, dict):
        return 1.0
    probes = c.get("drift_probe") or []
    idx_map = c.get("drift_index") or {}
    if name not in idx_map or not probes or float(probes[0]) <= 0.0:
        return 1.0
    i = int(idx_map[name])
    if not (0 <= i < len(probes)) or float(probes[i]) <= 0.0:
        return 1.0
    return float(probes[i]) / float(probes[0])


def diff(old_doc: dict, new_doc: dict) -> dict:
    """Pure comparison core (testable without git/files). Returns
    {"regressions", "improvements", "added", "removed", "messages",
    "fail"}; each regression/improvement is (name, old_raw, new_raw,
    new_adj)."""
    old, new = _queries(old_doc), _queries(new_doc)
    oc, nc = canary_info(old_doc), canary_info(new_doc)
    messages: list[str] = []

    default_ratio = 1.0
    normalizing = False
    if oc and nc:
        if oc["set"] != nc["set"]:
            messages.append(
                f"WARNING canary sets differ (old {oc['set']} vs new "
                f"{nc['set']}): totals not comparable, normalization "
                f"REFUSED (ratio 1.0)"
            )
        else:
            normalizing = True
            default_ratio = _clamp(nc["scan"] / oc["scan"])
            messages.append(
                f"canary scan: old {oc['scan']:.3f}s new {nc['scan']:.3f}s "
                f"-> box ratio {nc['scan'] / oc['scan']:.3f} "
                f"(applied {default_ratio:.3f})"
            )
            if oc["sentinel"] and nc["sentinel"]:
                sr = nc["sentinel"] / oc["sentinel"]
                cr = nc["scan"] / oc["scan"]
                messages.append(
                    f"canary sentinel: old {oc['sentinel']:.3f}s new "
                    f"{nc['sentinel']:.3f}s -> cpu ratio {sr:.3f}"
                )
                if cr / sr > DIVERGENCE:
                    messages.append(
                        f"WARNING scan canaries moved {cr:.2f}x but the "
                        f"pure-JVM sentinel only {sr:.2f}x: frozen-plan "
                        f"scans slowed without matching CPU slowness — "
                        f"either a slow-I/O box phase or a code "
                        f"regression in shared scan/session "
                        f"infrastructure; fresh-JVM spot-check a canary "
                        f"before trusting normalized numbers"
                    )
                elif sr / cr > DIVERGENCE:
                    messages.append(
                        f"WARNING sentinel moved {sr:.2f}x but scan "
                        f"canaries only {cr:.2f}x: CPU-bound slowness "
                        f"the scan canaries don't see — normalization "
                        f"may under-correct CPU-heavy queries"
                    )
    else:
        messages.append(
            "canary: absent on one side, no normalization (ratio 1.0)"
        )

    floor_canary = old_doc.get("floor_canary") or {}

    def adj(name: str, n_raw: float) -> float:
        if not normalizing:
            return n_raw / default_ratio
        # effective canary: session scan total re-priced to the box
        # phase this query ran in (drift factor 1.0 on pre-round-9 docs)
        eff_scan = nc["scan"] * drift_factor(new_doc, name)
        fc = floor_canary.get(name)
        if fc:
            return n_raw / _clamp(eff_scan / float(fc))
        return n_raw / _clamp(eff_scan / oc["scan"])

    regressions, improvements = [], []
    for name in sorted(set(old) & set(new)):
        o, n = old[name], new[name]
        n_adj = adj(name, n)
        if n_adj > o * RATIO + SLACK_S:
            regressions.append((name, o, n, n_adj))
        elif o > n_adj * RATIO + SLACK_S:
            improvements.append((name, o, n, n_adj))

    return {
        "regressions": regressions,
        "improvements": improvements,
        "added": sorted(set(new) - set(old)),
        "removed": sorted(set(old) - set(new)),
        "messages": messages,
        "ratio": default_ratio,
        "fail": bool(regressions),
    }


def triage_verdicts(
    old_doc: dict, regressions: list, triage_doc: dict
) -> tuple[list, list]:
    """Re-judge gate flags against a fresh-JVM triage session
    (bench_triage.py output shape: ``{"queries": {name: median_s},
    "scan_total": s}``). A flag CLEARS when its triage median,
    normalized to the flag's own floor-canary box regime
    (``med / clamp(triage_scan / floor_canary[q])``), is back under the
    gate limit ``old * RATIO + SLACK_S`` — i.e. the fresh JVM cannot
    reproduce the slowdown, so it was the box, not the plan. Flags the
    triage session has no measurement for stay CONFIRMED (never clear a
    flag on missing evidence). Pure — no subprocess, unit-testable.

    Returns ``(cleared, confirmed)``; each item is
    ``(name, old_floor, triage_med, triage_adj)``.
    """
    meds = {k: float(v) for k, v in (triage_doc.get("queries") or {}).items()}
    tscan = float(triage_doc.get("scan_total") or 0.0)
    oc = canary_info(old_doc)
    floor_canary = old_doc.get("floor_canary") or {}
    cleared, confirmed = [], []
    for name, o, _n_raw, _n_adj in regressions:
        med = meds.get(name)
        if med is None:
            confirmed.append((name, o, None, None))
            continue
        fc = floor_canary.get(name) or (oc["scan"] if oc else None)
        adj = med / _clamp(tscan / float(fc)) if (fc and tscan > 0) else med
        if adj <= o * RATIO + SLACK_S:
            cleared.append((name, o, med, adj))
        else:
            confirmed.append((name, o, med, adj))
    return cleared, confirmed


def _run_fresh_triage(names: list[str], sf_dir: str) -> dict:
    """Spawn bench_triage.py in a fresh interpreter (→ fresh JVM) and
    parse its one-line JSON result (the last stdout line)."""
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "bench_triage.py"),
         *names, "--sf-dir", sf_dir],
        capture_output=True, text=True, check=True,
    )
    lines = [ln for ln in proc.stdout.strip().splitlines() if ln.strip()]
    return json.loads(lines[-1])


def apply_triage(
    old_doc: dict,
    new_doc: dict,
    res: dict,
    run_triage=_run_fresh_triage,
    sf_dir: str | None = None,
) -> dict:
    """The --triage step as a pure-ish function (``run_triage``
    injectable for tests): reuse ``new_doc['triage']`` when it already
    covers every flag, else measure fresh; return the triage block to
    stamp — ``{queries, scan_total, cleared, confirmed}``."""
    names = [name for name, *_ in res["regressions"]]
    existing = new_doc.get("triage") or {}
    if set(names) <= set(existing.get("queries") or {}):
        tdoc = existing
        reused = True
    else:
        if sf_dir is None:
            sf = new_doc.get("sf")
            sf_dir = os.environ.get(
                "SPARK_GRAFT_SF_DIR",
                f"/root/testdata/sf{sf}" if sf else "/root/testdata/sf0.1",
            )
        tdoc = run_triage(names, sf_dir)
        reused = False
    cleared, confirmed = triage_verdicts(old_doc, res["regressions"], tdoc)
    return {
        "queries": {k: float(v) for k, v in (tdoc.get("queries") or {}).items()},
        "scan_total": float(tdoc.get("scan_total") or 0.0),
        "cleared": sorted(name for name, *_ in cleared),
        "confirmed": sorted(name for name, *_ in confirmed),
        "_cleared_detail": cleared,
        "_confirmed_detail": confirmed,
        "_reused": reused,
    }


def main() -> int:
    argv = sys.argv[1:]
    do_triage = "--triage" in argv
    if do_triage:
        argv.remove("--triage")
    old_src = argv[0] if argv else "HEAD"
    if len(argv) > 1:
        new_src = argv[1]
    else:
        run = os.path.join(REPO, "BENCH_RUN.json")
        new_src = run if os.path.exists(run) else os.path.join(
            REPO, "BENCH_DETAIL.json"
        )
    old_doc, new_doc = _load(old_src), _load(new_src)
    res = diff(old_doc, new_doc)
    for m in res["messages"]:
        print(m)
    if res["added"]:
        print(f"added ({len(res['added'])}): {', '.join(res['added'])}")
    if res["removed"]:
        print(f"removed ({len(res['removed'])}): {', '.join(res['removed'])}")
    for name, o, n, n_adj in res["improvements"]:
        print(f"IMPROVED  {name}: {o:.3f}s -> {n:.3f}s "
              f"(adj {n_adj:.3f}s, {n_adj / max(o, 1e-9):.2f}x)")
    for name, o, n, n_adj in res["regressions"]:
        print(f"REGRESSED {name}: {o:.3f}s -> {n:.3f}s "
              f"(adj {n_adj:.3f}s, {n_adj / max(o, 1e-9):.2f}x)"
              f"  [limit {o * RATIO + SLACK_S:.3f}s]")

    old, new = _queries(old_doc), _queries(new_doc)
    shared = set(old) & set(new)
    tot_o = sum(old[q] for q in shared)
    tot_n = sum(new[q] for q in shared)
    print(f"shared-query total: {tot_o:.1f}s -> {tot_n:.1f}s "
          f"(adj {tot_n / res['ratio']:.1f}s, {len(shared)} queries)")
    if res["fail"]:
        if do_triage:
            tri = apply_triage(old_doc, new_doc, res)
            src = "reused stamped triage" if tri["_reused"] else "fresh JVM"
            print(f"triage ({src}, scan_total {tri['scan_total']:.3f}s):")
            for name, o, med, adj in tri["_cleared_detail"]:
                print(f"  CLEARED   {name}: floor {o:.3f}s, triage "
                      f"{med:.3f}s (adj {adj:.3f}s <= limit "
                      f"{o * RATIO + SLACK_S:.3f}s)")
            for name, o, med, adj in tri["_confirmed_detail"]:
                shown = f"{med:.3f}s (adj {adj:.3f}s)" if med is not None \
                    else "no measurement"
                print(f"  CONFIRMED {name}: floor {o:.3f}s, triage {shown} "
                      f"> limit {o * RATIO + SLACK_S:.3f}s")
            # stamp the triage block into the NEW-side run file so the
            # session record carries its own adjudication
            if os.path.isfile(new_src):
                new_doc["triage"] = {
                    k: v for k, v in tri.items() if not k.startswith("_")
                }
                with open(new_src, "w") as fh:
                    json.dump(new_doc, fh, indent=2, sort_keys=True)
                print(f"triage block stamped into {new_src}")
            if not tri["confirmed"]:
                print(f"OK: all {len(res['regressions'])} flag(s) "
                      f"triage-cleared (environmental)")
                return 0
            print(f"FAIL: {len(tri['confirmed'])} flag(s) CONFIRMED by "
                  f"fresh-JVM triage")
            return 1
        print(f"FAIL: {len(res['regressions'])} per-query regression(s) past "
              f"{RATIO}x + {SLACK_S}s (canary-adjusted)")
        return 1
    print("OK: no per-query regressions (canary-adjusted)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
