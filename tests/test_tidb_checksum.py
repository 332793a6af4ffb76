"""Byte-exact TiDB row checksum (verify_checksum.go:92-229): the Spark
encodings are cross-checked against an independent Python twin of the Go
algorithm (struct.pack little-endian + zlib.crc32 — Go's
crc32.Update(0, IEEETable, ...) IS zlib's CRC-32), independent of the
DuckDB oracle that the driver runs."""

from __future__ import annotations

import math
import struct
import zlib

import pytest
from pyspark.sql import functions as F

from tigate_spark.operators.projections import (
    build_checksum_bytes,
    float64_bits,
    tidb_row_checksum,
)


def _go_checksum(values: list[tuple[object, str]]) -> int:
    """Reference twin of calculateChecksum/buildChecksumBytes."""
    crc = 0
    for v, t in values:
        if v is None:
            buf = b""
        elif t in ("int", "enum", "bit"):
            buf = struct.pack("<Q", v & 0xFFFFFFFFFFFFFFFF)
        elif t == "double":
            if math.isnan(v) or math.isinf(v):
                v = 0.0
            buf = struct.pack("<d", v)
        else:  # string/datetime/timestamp/decimal/json: len + utf-8
            b = str(v).encode("utf-8")
            buf = struct.pack("<I", len(b)) + b
        crc = zlib.crc32(buf, crc)
    return crc


def test_float64_bits_exact(spark):
    vals = [172799.49, -3.14159, 1.0, 0.5, 1e-300, 6.02e23, 0.0,
            5e-324, 2.2250738585072014e-308, -123456.78]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    got = {r.v: r.bits for r in
           df.select("v", float64_bits(F.col("v")).alias("bits")).collect()}
    for v in vals:
        assert got[v] == struct.unpack("<q", struct.pack("<d", v))[0], v


def test_checksum_matches_go_twin(spark):
    rows = [
        (1, -7, "F", 172799.49, "1996-01-02 00:00:00", None, 2, 1),
        (2, 40000000000, "O", 0.0, "1997-12-31 23:59:59", "x" * 40, 1, 0),
        (3, 0, "", -1.5e-310, "2000-02-29 12:00:00", "", 3, 1),
    ]
    df = spark.createDataFrame(
        rows, "k bigint, c bigint, s string, d double, dt string, "
              "nl string, en int, bt int")
    lanes = [(F.col("k"), "int"), (F.col("c"), "int"), (F.col("s"), "string"),
             (F.col("d"), "double"), (F.col("dt"), "datetime"),
             (F.col("nl"), "string"), (F.col("en"), "enum"),
             (F.col("bt"), "bit")]
    got = {r.k: r.ck for r in
           df.select("k", tidb_row_checksum(lanes).alias("ck")).collect()}
    types = ["int", "int", "string", "double", "datetime", "string",
             "enum", "bit"]
    for row in rows:
        assert got[row[0]] == _go_checksum(list(zip(row, types))), row


def test_null_column_appends_nothing(spark):
    # a NULL lane must leave the CRC identical to omitting the lane
    df = spark.createDataFrame([(5, None)], "k bigint, s string")
    with_null = df.select(tidb_row_checksum(
        [(F.col("k"), "int"), (F.col("s"), "string")]).alias("ck")).first().ck
    without = df.select(tidb_row_checksum(
        [(F.col("k"), "int")]).alias("ck")).first().ck
    assert with_null == without == _go_checksum([(5, "int")])


def test_checksum_plan_is_pure_jvm(spark):
    df = spark.createDataFrame([(1, "a")], "k bigint, s string")
    out = df.select(tidb_row_checksum(
        [(F.col("k"), "int"), (F.col("s"), "string")]).alias("ck"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_checksum_property_random_rows(spark):
    """Property: arbitrary int64/string/double rows (including extremes,
    NaN/Inf, empty and non-ASCII strings) checksum identically to the
    struct.pack/zlib Go twin. One batched Spark job for the whole
    sample, not one per case."""
    import random

    rng = random.Random(20260815)
    specials_i = [0, 1, -1, 127, 128, -128, 2**31 - 1, -2**31,
                  2**63 - 1, -2**63]
    specials_d = [0.0, -0.0, 1.5, -1.5, float("nan"), float("inf"),
                  float("-inf"), 5e-324, 1.7976931348623157e308]
    specials_s = ["", "a", "x" * 300, "naïve-日本語", "\t\n"]
    rows = []
    for k in range(120):
        rows.append((
            k,
            rng.choice(specials_i) if k % 3 == 0
            else rng.randrange(-2**62, 2**62),
            rng.choice(specials_s) if k % 4 == 0
            else "s%d" % rng.randrange(10**6),
            rng.choice(specials_d) if k % 5 == 0
            else rng.uniform(-1e12, 1e12),
        ))
    df = spark.createDataFrame(rows, "k bigint, i bigint, s string, d double")
    lanes = [(F.col("i"), "int"), (F.col("s"), "string"),
             (F.col("d"), "double")]
    got = {r.k: r.ck for r in
           df.select("k", tidb_row_checksum(lanes).alias("ck")).collect()}
    for k, i, s, d in rows:
        exp = _go_checksum([(i, "int"), (s, "string"), (d, "double")])
        assert got[k] == exp, (k, i, s, d)
