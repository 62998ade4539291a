import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("COPPERHEAD_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def spark():
    from copperhead_spark.session import get_spark

    s = get_spark(app_name="copperhead-tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def duck(sf_dir):
    from copperhead_spark.testing import make_duckdb

    con = make_duckdb(sf_dir)
    yield con
    con.close()
