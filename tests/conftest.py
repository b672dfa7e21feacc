"""Shared SparkSession fixture (one JVM for the whole test run)."""

from __future__ import annotations

import pytest

from hades_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("hades_spark_tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return "/root/testdata/sf0.001"
