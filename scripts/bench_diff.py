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
and records their total under ``canary`` in BENCH_DETAIL.json. Here,
every NEW timing is divided by the canary ratio (new canary total /
old canary total, clamped to [0.25, 4]) before the gate applies —
so a uniformly-slow box cancels out and only per-query PLAN changes
flag. Runs missing canary data (pre-round-7 baselines) fall back to
ratio 1.0, i.e. the old unnormalized gate.

Usage:
    python scripts/bench_diff.py                    # HEAD vs working tree
    python scripts/bench_diff.py OLD.json NEW.json  # explicit files

With no arguments the OLD side is the last committed BENCH_DETAIL.json
(``git show HEAD:BENCH_DETAIL.json``) and the NEW side is the working
tree copy. Added/removed queries are reported but never fail the gate
(new queries have no baseline; removals are a registry decision the
oracle gate polices).
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


def _canary_total(doc: dict) -> float | None:
    c = doc.get("canary") if isinstance(doc, dict) else None
    if isinstance(c, dict) and c.get("total"):
        return float(c["total"])
    return None


def main() -> int:
    old_src = sys.argv[1] if len(sys.argv) > 1 else "HEAD"
    new_src = sys.argv[2] if len(sys.argv) > 2 else os.path.join(REPO, "BENCH_DETAIL.json")
    old_doc, new_doc = _load(old_src), _load(new_src)
    old, new = _queries(old_doc), _queries(new_doc)

    oc, nc = _canary_total(old_doc), _canary_total(new_doc)
    if oc and nc:
        ratio = max(CANARY_CLAMP[0], min(CANARY_CLAMP[1], nc / oc))
        print(f"canary: old {oc:.3f}s new {nc:.3f}s -> box ratio "
              f"{nc / oc:.3f} (applied {ratio:.3f})")
    else:
        ratio = 1.0
        print("canary: absent on one side, no normalization (ratio 1.0)")

    regressions, improvements = [], []
    for name in sorted(set(old) & set(new)):
        o, n = old[name], new[name]
        n_adj = n / ratio
        if n_adj > o * RATIO + SLACK_S:
            regressions.append((name, o, n, n_adj))
        elif o > n_adj * RATIO + SLACK_S:
            improvements.append((name, o, n, n_adj))

    added = sorted(set(new) - set(old))
    removed = sorted(set(old) - set(new))
    if added:
        print(f"added ({len(added)}): {', '.join(added)}")
    if removed:
        print(f"removed ({len(removed)}): {', '.join(removed)}")
    for name, o, n, n_adj in improvements:
        print(f"IMPROVED  {name}: {o:.3f}s -> {n:.3f}s "
              f"(adj {n_adj:.3f}s, {n_adj / max(o, 1e-9):.2f}x)")
    for name, o, n, n_adj in regressions:
        print(f"REGRESSED {name}: {o:.3f}s -> {n:.3f}s "
              f"(adj {n_adj:.3f}s, {n_adj / max(o, 1e-9):.2f}x)"
              f"  [limit {o * RATIO + SLACK_S:.3f}s]")

    tot_o = sum(old[q] for q in set(old) & set(new))
    tot_n = sum(new[q] for q in set(old) & set(new))
    print(f"shared-query total: {tot_o:.1f}s -> {tot_n:.1f}s "
          f"(adj {tot_n / ratio:.1f}s, {len(set(old) & set(new))} queries)")
    if regressions:
        print(f"FAIL: {len(regressions)} per-query regression(s) past "
              f"{RATIO}x + {SLACK_S}s (canary-adjusted)")
        return 1
    print("OK: no per-query regressions (canary-adjusted)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
