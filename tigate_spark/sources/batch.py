"""Batch parquet sources over the driver testdata layout.

Reference parity: the snapshot-bootstrap scan (tigate
``logservice/schemastore/schema_store.go:26`` — enumerate tables at a
snapshot ts) collapses to ``spark.read.parquet`` per table; Catalyst gives
predicate pushdown + column pruning on these scans for free (SURVEY §4).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from tigate_spark.session import ensure_confs

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table. ``events.ts`` dtype varies by data vintage
    (timestamp_ntz today, epoch-nanos long historically) — downstream code
    normalizes via ``sources.changes.event_us``."""
    ensure_confs(spark)
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}
