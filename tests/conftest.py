from __future__ import annotations

import os

import pytest

os.environ.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from amazonwebcrawler_spark.session import get_spark

    s = get_spark(app_name="awc-tests", master="local[4]", shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return os.environ["SPARK_GRAFT_SF_DIR"]


@pytest.fixture()
def duckdb_conn():
    import duckdb

    conn = duckdb.connect()
    yield conn
    conn.close()
