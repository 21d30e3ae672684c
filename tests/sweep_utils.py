"""Shared helpers for the suite's time budget (round 12, VERDICT r11
#1): the default suite must fit the verify gate's pytest budget, so
long-running tests are marked ``slow`` (skipped by default; see
conftest) and the two full-registry sweeps run a deterministic subset
unless SPARK_GRAFT_SLOW_TESTS=1."""

import hashlib
import os


def run_slow_tests() -> bool:
    return os.environ.get("SPARK_GRAFT_SLOW_TESTS", "") == "1"


def sweep_sample(names):
    """Deterministic ~1/8 subset for the default (budgeted) suite; the
    FULL sweep runs under SPARK_GRAFT_SLOW_TESTS=1 (the two
    full-registry sweeps alone cost ~11 min of the ~32 min suite).
    The subset is a pure function of the query name — stable across
    runs, no registry-order dependence."""
    if run_slow_tests():
        return list(names)
    return [n for n in names if hashlib.md5(n.encode()).digest()[0] % 8 == 0]
