"""Shared fixtures: one SparkSession per test session (JVM startup is the
dominant cost), one DuckDB connection with the testdata views registered."""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bpspark.io import TABLES  # noqa: E402
from bpspark.session import build  # noqa: E402

SF_SMALL = os.environ.get("BPSPARK_TEST_SF_DIR", "/root/testdata/sf0.001")
SF_ORACLE = os.environ.get("BPSPARK_ORACLE_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    s = build(app_name="bpspark-tests", extra_conf={"spark.sql.shuffle.partitions": "8"})
    yield s
    s.stop()


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


@pytest.fixture(scope="session")
def duck_small():
    return duck_con(SF_SMALL)
