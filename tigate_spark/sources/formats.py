"""Alternative source formats — S1 connectors beyond parquet.

The reference ingests its changelog from TiKV gRPC streams; this engine's
equivalent statement is that ANY file format Spark can scan feeds the
same `normalize_events` plan (`sources/changes.py:70` — identical
Catalyst plan batch or streaming). These readers prove it for CSV and
JSON-lines: a deterministic export of the events table re-ingested
through the text format produces byte-identical canonical change rows
(the `source_csv_changes` / `source_jsonl_changes` catalog entries run
against the same DuckDB oracle as the parquet path).

Schema-explicit readers only: schema inference on text sources is both
slow (extra full scan) and drift-prone at 100 TB — the schema IS the
contract. Timestamps travel as epoch-microsecond integers (`ts_us`) so
no text-format timezone/precision parsing is in the loop; the reader
rebuilds the `ts` column via `timestamp_micros` (session tz is pinned
UTC, so the cast is identity on the wall clock).
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tigate_spark.sources.batch import load_table
from tigate_spark.sources.changes import event_us

EVENTS_FLAT_SCHEMA = ("event_id BIGINT, ts_us BIGINT, user_id BIGINT, "
                      "event_type STRING, value DOUBLE, props STRING")

#: session-scoped export cache: (sf_dir, fmt) -> path
_EXPORTS: dict[tuple[str, str], str] = {}
_EXPORT_ROOT: str | None = None


def _flat_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id", event_us(ev).alias("ts_us"), "user_id", "event_type",
        "value", "props",
    )


def export_events(spark: SparkSession, sf_dir: str, fmt: str) -> str:
    """Render the events table to CSV or JSON-lines once per session
    (deterministic row content; file order irrelevant — the reader is
    set-equal by construction). Returns the export directory."""
    global _EXPORT_ROOT
    key = (sf_dir, fmt)
    if key in _EXPORTS:
        return _EXPORTS[key]
    if _EXPORT_ROOT is None:
        _EXPORT_ROOT = tempfile.mkdtemp(prefix="tigate-src-formats-")
        atexit.register(shutil.rmtree, _EXPORT_ROOT, ignore_errors=True)
    safe = "".join(c if c.isalnum() else "_" for c in sf_dir)
    out = os.path.join(_EXPORT_ROOT, f"{fmt}-{safe}")
    flat = _flat_events(spark, sf_dir)
    if fmt == "csv":
        flat.write.mode("overwrite").option("header", "true").csv(out)
    elif fmt == "jsonl":
        flat.write.mode("overwrite").json(out)
    else:
        raise ValueError(f"unsupported source format: {fmt}")
    _EXPORTS[key] = out
    return out


def read_events(spark: SparkSession, path: str, fmt: str) -> DataFrame:
    """Schema-explicit CSV / JSON-lines events reader; output matches the
    parquet `load_table(..., 'events')` frame column-for-column, so
    `normalize_events` consumes it unchanged."""
    if fmt == "csv":
        # multiLine: a quoted newline inside props must not split the
        # record — the writer quotes it, the reader must honor it
        df = (spark.read.schema(EVENTS_FLAT_SCHEMA)
              .option("header", "true").option("multiLine", "true")
              .csv(path))
    elif fmt == "jsonl":
        df = spark.read.schema(EVENTS_FLAT_SCHEMA).json(path)
    else:
        raise ValueError(f"unsupported source format: {fmt}")
    return df.select(
        "event_id", F.timestamp_micros(F.col("ts_us")).alias("ts"),
        "user_id", "event_type", "value", "props",
    )
