import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ukis_pysat_spark.session import get_spark  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "perf: wall-clock ratio assertions; skippable under co-tenant "
        "CPU noise with -m 'not perf'",
    )


@pytest.fixture(scope="session")
def spark():
    s = get_spark("ukis-pysat-spark-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
