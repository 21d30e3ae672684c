"""Bench regression gate: diff two BENCH_DETAIL.json per-query timing
maps and FAIL (exit 1) on any regression worse than ``new > old * 1.5 +
0.3 s`` — the same per-query criterion the round judgments apply by
hand. Wired into the round-closing recipe (.claude/skills/verify) so a
plan regression like round 3's 58x gram blow-up is un-shippable: the
bench must be re-run and diffed before BENCH_DETAIL.json is committed.

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

# regression iff new > old * RATIO + SLACK_S — the ratio catches real
# plan changes on slow queries, the additive slack mutes timer noise on
# sub-100ms ones (where 1.5x is well inside box jitter)
RATIO = 1.5
SLACK_S = 0.3


def _load(source: str) -> dict[str, float]:
    if source == "HEAD":
        raw = subprocess.run(
            ["git", "-C", REPO, "show", "HEAD:BENCH_DETAIL.json"],
            capture_output=True, text=True, check=True,
        ).stdout
        doc = json.loads(raw)
    else:
        with open(source) as fh:
            doc = json.load(fh)
    queries = doc.get("queries", doc)
    return {k: float(v) for k, v in queries.items()}


def main() -> int:
    old_src = sys.argv[1] if len(sys.argv) > 1 else "HEAD"
    new_src = sys.argv[2] if len(sys.argv) > 2 else os.path.join(REPO, "BENCH_DETAIL.json")
    old, new = _load(old_src), _load(new_src)

    regressions, improvements = [], []
    for name in sorted(set(old) & set(new)):
        o, n = old[name], new[name]
        if n > o * RATIO + SLACK_S:
            regressions.append((name, o, n))
        elif o > n * RATIO + SLACK_S:
            improvements.append((name, o, n))

    added = sorted(set(new) - set(old))
    removed = sorted(set(old) - set(new))
    if added:
        print(f"added ({len(added)}): {', '.join(added)}")
    if removed:
        print(f"removed ({len(removed)}): {', '.join(removed)}")
    for name, o, n in improvements:
        print(f"IMPROVED  {name}: {o:.3f}s -> {n:.3f}s ({n / max(o, 1e-9):.2f}x)")
    for name, o, n in regressions:
        print(f"REGRESSED {name}: {o:.3f}s -> {n:.3f}s ({n / max(o, 1e-9):.2f}x)"
              f"  [limit {o * RATIO + SLACK_S:.3f}s]")

    tot_o = sum(old[q] for q in set(old) & set(new))
    tot_n = sum(new[q] for q in set(old) & set(new))
    print(f"shared-query total: {tot_o:.1f}s -> {tot_n:.1f}s "
          f"({len(set(old) & set(new))} queries)")
    if regressions:
        print(f"FAIL: {len(regressions)} per-query regression(s) past "
              f"{RATIO}x + {SLACK_S}s")
        return 1
    print("OK: no per-query regressions")
    return 0


if __name__ == "__main__":
    sys.exit(main())
