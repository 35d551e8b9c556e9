from __future__ import annotations

import os

import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
SF_DIR_T2 = os.environ.get("SPARK_GRAFT_T2_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    from presto_ads_spark.session import get_spark

    s = get_spark("presto-ads-spark-tests", master="local[8]")
    yield s


@pytest.fixture(scope="session")
def engine(spark):
    from presto_ads_spark.engine import Engine

    return Engine(spark, sf_dir=SF_DIR)


@pytest.fixture(scope="session")
def duck():
    from presto_ads_spark.testing import duckdb_connection

    return duckdb_connection(SF_DIR)
