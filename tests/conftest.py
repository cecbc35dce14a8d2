from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from medallion_etl_spark.session import get_spark  # noqa: E402

TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")
SF_TINY = os.path.join(TESTDATA, "sf0.001")
SF_SMALL = os.path.join(TESTDATA, "sf0.01")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("medallion-etl-spark-tests", parallelism=8, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_tiny() -> str:
    return SF_TINY


@pytest.fixture(scope="session")
def sf_small() -> str:
    return SF_SMALL
