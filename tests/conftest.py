import os

import pytest

from datas_spark.session import get_spark

# Round-12 (VERDICT r11 #1): the full suite outgrew the verify-gate
# time budget (747 tests, ~32 min on this box — the r11 driver run was
# cut at ~86% with zero failures). Tests carrying the heaviest
# equivalence fuzzes / full-registry sweeps are marked ``slow`` and
# SKIPPED BY DEFAULT; SPARK_GRAFT_SLOW_TESTS=1 runs everything (the
# end-of-round verification always sets it — see OPTIMIZATION_r12.md).


from sweep_utils import run_slow_tests  # noqa: E402


def pytest_collection_modifyitems(config, items):
    if run_slow_tests():
        return
    skip = pytest.mark.skip(
        reason="slow test skipped by default (set SPARK_GRAFT_SLOW_TESTS=1)"
    )
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture(scope="session")
def spark():
    s = get_spark("datas-spark-tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    # override to run data-parameterized suites (e.g. the plan sweep)
    # against another scale, such as the synthesized sf1:
    #   SPARK_GRAFT_TEST_SF_DIR=.testdata/sf1 pytest tests/test_plans.py
    import os

    return os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
