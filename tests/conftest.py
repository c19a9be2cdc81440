from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from radmapper_spark.session import get_spark, load_tables

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    spark = get_spark("radmapper-tests")
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def tables(spark):
    return load_tables(spark, SF_SMOKE)


@pytest.fixture(scope="session")
def tables_sf001(spark):
    return load_tables(spark, SF_CORRECT)
