from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tigate_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("TIGATE_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tigate-tests", cpus=int(os.environ.get("TIGATE_TEST_CPUS", "8")))
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def spark_prop(spark):
    """Alias fixture for property tests (function-scoped hypothesis runs
    share the session-scoped SparkSession)."""
    return spark
