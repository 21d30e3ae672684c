import pytest

from datas_spark.session import get_spark


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
