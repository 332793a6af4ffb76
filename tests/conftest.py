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


@pytest.fixture(scope="module")
def chunked_source(spark, sf_dir, tmp_path_factory):
    """events split into 4 files ordered by commit_ts → 4 micro-batches
    (the shared changefeed-source shape; module-scoped so each suite
    gets its own copy). Suites needing a different chunking define a
    local override."""
    import glob

    from pyspark.sql import functions as F

    src = str(tmp_path_factory.mktemp("events_src"))
    ev = spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))
    qs = ev.approxQuantile("event_id", [0.25, 0.5, 0.75], 0.0)
    bounds = [float("-inf"), *qs, float("inf")]
    for i in range(4):
        part = ev.filter((F.col("event_id") > bounds[i])
                         & (F.col("event_id") <= bounds[i + 1]))
        part.coalesce(1).write.parquet(os.path.join(src, f"chunk-{i:02d}"))
    flat = str(tmp_path_factory.mktemp("events_flat"))
    for i in range(4):
        for f in sorted(glob.glob(
                os.path.join(src, f"chunk-{i:02d}", "part-*.parquet"))):
            os.link(f, os.path.join(flat, f"{i:02d}-{os.path.basename(f)}"))
    return flat
