import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def pytest_configure(config):
    config.addinivalue_line("markers", "spark: test requires a SparkSession")


@pytest.fixture(scope="session")
def spark():
    from dask_patternsearch_spark.session import get_spark

    s = get_spark("dps-tests", cpus=os.environ.get("SPARK_GRAFT_TEST_CPUS", "4"))
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
