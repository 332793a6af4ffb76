"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship CDC pipeline at sf0.001;
``queries()`` / ``oracle_sql()`` expose every implemented SURVEY §2
operator from :mod:`tigate_spark.catalog` with its DuckDB oracle.
"""

from __future__ import annotations

import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, "/root/repo")

from tigate_spark.catalog import get_catalog  # noqa: E402
from tigate_spark.session import ensure_confs  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    ensure_confs(spark)
    cat = get_catalog()
    return cat["cdc_pipeline_e2e"].builder(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for name, spec in get_catalog().items():
        def make(b):
            def run(spark: SparkSession, sf_dir: str) -> DataFrame:
                ensure_confs(spark)
                return b(spark, sf_dir)

            return run

        out[name] = make(spec.builder)
    return out


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle per query (omitted → rows-only check)."""
    return {name: spec.oracle for name, spec in get_catalog().items() if spec.oracle}
