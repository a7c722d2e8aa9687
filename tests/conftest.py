from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hive_hw_spark.session import get_spark  # noqa: E402
from tests.oracle_harness import duckdb_conn  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="hive_hw_spark_tests")
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def oracle(sf_dir):
    con = duckdb_conn(sf_dir)
    yield con
    con.close()


@pytest.fixture(scope="session")
def tiny_sf_dir():
    return os.environ.get("SPARK_GRAFT_TINY_SF_DIR", "/root/testdata/sf0.001")
