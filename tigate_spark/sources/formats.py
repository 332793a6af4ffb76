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

CSV is SPLITTABLE by contract: free-form text columns are exported
through :func:`csv_escape_text` (``\\`` → ``\\\\``, LF → ``\\n``, CR →
``\\r``) so no physical record ever spans a line, and the reader runs
with ``multiLine=false`` — Spark splits large CSV files into ordinary
``maxPartitionBytes`` chunks instead of collapsing scan parallelism to
one task per file (the 100 TB failure mode of ``multiLine=true``).
:func:`csv_unescape_text` inverts the mapping exactly (split on the
escaped-backslash pair, then expand ``\\n``/``\\r`` per segment — a
single left-to-right pass, so ``\\\\n`` is a backslash + 'n', never a
newline). Null vs empty string is explicit on both sides: null travels
as the unquoted ``\\N`` sentinel (unambiguous — a DATA value ``\\N``
escapes to ``\\\\N``), empty string as ``""``; the writer and both
batch/streaming readers pin ``nullValue``/``emptyValue`` so the parquet
path's distinction survives the text round trip byte-for-byte
(tests/test_round8_csv_splittable.py property-tests hostile payloads).
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

#: the free-form text columns that go through the CSV escape layer
CSV_TEXT_COLS = ("event_type", "props")

#: pinned writer/reader options: null = unquoted \N (MySQL dump
#: convention), empty string = "" — reader side mirrors exactly so
#: null vs '' survives the round trip (writer emptyValue needs the
#: quoted literal, reader compares the unquoted token)
CSV_WRITE_OPTIONS = {"header": "true", "nullValue": "\\N",
                     "emptyValue": '""'}
CSV_READ_OPTIONS = {"header": "true", "nullValue": "\\N",
                    "multiLine": "false"}


def csv_escape_text(col):
    """Newline-free CSV cell encoding: ``\\`` → ``\\\\`` first (so the
    escape char is self-delimiting), then LF → ``\\n``, CR → ``\\r``.
    Literal `F.replace` chain — whole-stage codegen, no regex."""
    c = F.replace(col, F.lit("\\"), F.lit("\\\\"))
    c = F.replace(c, F.lit("\n"), F.lit("\\n"))
    return F.replace(c, F.lit("\r"), F.lit("\\r"))


def csv_unescape_text(col):
    """Exact inverse of :func:`csv_escape_text` in ONE left-to-right
    pass: split on the escaped-backslash PAIR, expand ``\\n``/``\\r``
    inside each segment (segments contain no doubled backslash, so a
    remaining ``\\n`` is unambiguously an escaped newline), re-join on a
    single backslash. `split`/`transform`/`array_join` are all JVM-side
    expressions; `limit=-1` keeps trailing empty segments so a trailing
    backslash round-trips."""

    def _part(s):
        return F.replace(F.replace(s, F.lit("\\n"), F.lit("\n")),
                         F.lit("\\r"), F.lit("\r"))

    return F.array_join(
        F.transform(F.split(col, r"\\\\", -1), _part), "\\")


def decode_csv_events(raw: DataFrame) -> DataFrame:
    """Rebuild canonical events rows from a flat-schema CSV scan: undo
    the text escape on the free-form columns, rebuild `ts` from epoch-us.
    Shared by the batch reader and the streaming changefeed CSV branch so
    the two plans cannot diverge."""
    cols = [
        "event_id", F.timestamp_micros(F.col("ts_us")).alias("ts"),
        "user_id", csv_unescape_text(F.col("event_type")).alias("event_type"),
        "value", csv_unescape_text(F.col("props")).alias("props"),
    ]
    return raw.select(*cols)

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
        w = flat.select(
            "event_id", "ts_us", "user_id",
            csv_escape_text(F.col("event_type")).alias("event_type"),
            "value", csv_escape_text(F.col("props")).alias("props"),
        ).write.mode("overwrite")
        for k, v in CSV_WRITE_OPTIONS.items():
            w = w.option(k, v)
        w.csv(out)
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
        # splittable scan: records are one physical line by the export
        # contract (csv_escape_text), so multiLine stays false and Spark
        # chunks big files by maxPartitionBytes
        r = spark.read.schema(EVENTS_FLAT_SCHEMA)
        for k, v in CSV_READ_OPTIONS.items():
            r = r.option(k, v)
        return decode_csv_events(r.csv(path))
    if fmt == "jsonl":
        df = spark.read.schema(EVENTS_FLAT_SCHEMA).json(path)
    else:
        raise ValueError(f"unsupported source format: {fmt}")
    return df.select(
        "event_id", F.timestamp_micros(F.col("ts_us")).alias("ts"),
        "user_id", "event_type", "value", "props",
    )
