from __future__ import annotations

import pytest

from azurestorage_blueprints_spark.oracle import duckdb_connection
from azurestorage_blueprints_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="tests", cpus=8)
    yield spark


@pytest.fixture(scope="session")
def duck():
    con = duckdb_connection(SF_DIR)
    yield con
    con.close()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
