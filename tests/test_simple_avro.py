"""Simple-protocol Avro encoding format: wire-level spec tests for the
generic reader, and encode→decode round trips where encoder (dual-dialect
SQL expressions) and decoder (schema-driven Python reader) meet only at
the byte level (``pkg/sink/codec/simple/marshaller.go:50-56``,
``simple/avro.go``, ``simple/message.json``)."""

from __future__ import annotations

import struct

import pytest
from pyspark.sql import functions as F

from tigate_spark.functions.simple_avro import (
    DDL_TYPES,
    MESSAGE_SCHEMA,
    avro_read,
    decode_message,
    decode_simple_avro_rows,
    encode_simple_avro,
    encode_simple_avro_bootstrap,
    encode_simple_avro_ddl,
    simple_avro_watermark_sql,
)
from tigate_spark.sources.changes import changes_stream


# -- Avro binary primitives against the spec --------------------------------

def _zz(n: int) -> bytes:
    u = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        out.append(b | 0x80 if u else b)
        if not u:
            return bytes(out)


def test_reader_longs_zigzag():
    for v in (0, 1, -1, 63, 64, -64, -65, 2**31, -2**31, 2**53, -2**53):
        got, i = avro_read("long", _zz(v))
        assert got == v and i == len(_zz(v))


def test_reader_string_float_double_bool_null():
    assert avro_read("string", _zz(3) + b"abc") == ("abc", 4)
    assert avro_read("float", struct.pack("<f", 1.5)) == (1.5, 4)
    assert avro_read("double", struct.pack("<d", -2.25)) == (-2.25, 8)
    assert avro_read("boolean", b"\x01") == (True, 1)
    assert avro_read("null", b"") == (None, 0)


def test_reader_union_and_map_blocks():
    # union [null, long]: branch 1 then value
    assert avro_read(["null", "long"], _zz(1) + _zz(7)) == (7, 2)
    assert avro_read(["null", "long"], _zz(0)) == (None, 1)
    # map in TWO blocks + negative block count with byte-size prefix
    m = {"type": "map", "values": "long"}
    blocks = (_zz(1) + _zz(1) + b"a" + _zz(10)          # block of 1
              + _zz(-1) + _zz(3) + _zz(1) + b"b" + _zz(20)  # neg count
              + _zz(0))
    got, _ = avro_read(m, blocks)
    assert got == {"a": 10, "b": 20}


def test_reader_array_of_records():
    sch = {"type": "array", "items": {
        "type": "record", "name": "P", "fields": [("x", "long")]}}
    raw = _zz(2) + _zz(5) + _zz(6) + _zz(0)
    assert avro_read(sch, raw) == ([{"x": 5}, {"x": 6}], len(raw))


# -- wire invariants of each message kind ------------------------------------

@pytest.fixture(scope="module")
def changes(spark, sf_dir):
    return changes_stream(spark, sf_dir)


def test_dml_wire_head_and_unions(spark, changes):
    rows = (encode_simple_avro(changes)
            .select("op", "message_hex").limit(200).collect())
    saw = set()
    for r in rows:
        hx = r["message_hex"]
        # Message.type enum DML(3) + payload union branch 3 + version 1
        assert hx.startswith("060602")
        m = decode_message(bytes.fromhex(hx))
        assert m["type"] == "DML"
        p = m["payload"]
        assert p["claimCheckLocation"] is None
        assert p["handleKeyOnly"] is None
        assert p["checksum"] is None
        assert p["buildTs"] == p["commitTs"] // 1000
        if r["op"] == "I":
            assert p["data"] is not None and p["old"] is None
        elif r["op"] == "D":
            assert p["data"] is None and p["old"] is not None
        else:
            assert p["data"] is not None and p["old"] is not None
            # the before image differs by the pinned derivation
            assert (p["old"]["value_cents"]["value"]
                    == p["data"]["value_cents"]["value"] - 100)
        saw.add(r["op"])
    assert saw == {"I", "U", "D"}


def test_dml_value_union_branches(spark, changes):
    hx = (encode_simple_avro(changes.filter(F.col("op") == "I"))
          .select("message_hex").first()["message_hex"])
    data = decode_message(bytes.fromhex(hx))["payload"]["data"]
    assert isinstance(data["pk"], int)                     # long branch
    assert isinstance(data["event_type"], str)             # string branch
    assert data["value_cents"] == {"value": data["value_cents"]["value"]}
    assert data["updated_at"]["location"] == "UTC"         # Timestamp rec
    assert len(data["updated_at"]["value"]) == 19


def test_roundtrip_matches_source(spark, changes):
    src = changes.select("seq", "op", "pk", "event_type", "value_cents",
                         "user_id", "commit_ts", "table_name").limit(500)
    dec = decode_simple_avro_rows(
        encode_simple_avro(changes).select("seq", "message_hex").limit(500))
    j = src.join(dec, "seq", "inner").cache()
    n = j.count()
    assert n == 500
    bad = j.filter(
        (dec["op"] != src["op"])
        | (dec["pk"] != src["pk"])
        | (dec["event_type"] != src["event_type"])
        | (dec["user_id"] != src["user_id"])
        | (dec["commit_ts"] != src["commit_ts"])
        | (dec["table_name"] != src["table_name"])
        | (F.when(src["op"] == "D",
                  dec["value_cents"] != src["value_cents"] - 100)
           .otherwise(dec["value_cents"] != src["value_cents"])))
    assert bad.count() == 0
    j.unpersist()


def test_watermark_wire(spark):
    df = spark.range(1).selectExpr("1704067200000000 AS resolved_ts")
    hx = df.selectExpr(
        f"{simple_avro_watermark_sql('spark')} AS h").first()["h"]
    m = decode_message(bytes.fromhex(hx))
    assert m["type"] == "WATERMARK"
    assert m["payload"] == {"version": 1, "commitTs": 1704067200000000,
                            "buildTs": 1704067200000}


def test_bootstrap_wire_schema_walk(spark):
    df = spark.createDataFrame(
        [("app", "t7", 7, 1704067200000000)],
        "schema_name STRING, table_name STRING, table_id LONG, "
        "version_ts LONG")
    hx = encode_simple_avro_bootstrap(df).first()["message_hex"]
    m = decode_message(bytes.fromhex(hx))
    assert m["type"] == "BOOTSTRAP"
    ts = m["payload"]["tableSchema"]
    assert (ts["database"], ts["table"], ts["tableID"]) == ("app", "t7", 7)
    names = [c["name"] for c in ts["columns"]]
    assert names == ["pk", "event_type", "value_cents", "user_id",
                     "updated_at"]
    by = {c["name"]: c for c in ts["columns"]}
    # numeric columns carry the unsigned/zerofill holders; others null
    assert by["value_cents"]["dataType"]["unsigned"] is True
    assert by["pk"]["dataType"]["unsigned"] is False
    assert by["event_type"]["dataType"]["unsigned"] is None
    assert by["updated_at"]["dataType"]["mysqlType"] == "timestamp"
    assert by["pk"]["nullable"] is False
    idx = ts["indexes"]
    assert len(idx) == 1 and idx[0]["primary"] and idx[0]["columns"] == ["pk"]


def test_ddl_wire_presence_rule(spark):
    df = spark.createDataFrame(
        [(1, 1704067200000000, 10, "create table", "CREATE TABLE x (id INT)"),
         (1, 1704067200000001, 11, "drop table", "DROP TABLE x"),
         (1, 1704067200000002, 12, "add column",
          "ALTER TABLE x ADD COLUMN c INT")],
        "table_id LONG, commit_ts LONG, seq LONG, ddl_type STRING, "
        "query STRING") \
        .withColumn("schema_name", F.lit("app")) \
        .withColumn("table_name", F.concat(F.lit("t"),
                                           F.col("table_id").cast("string")))
    out = {r["seq"]: r["message_hex"]
           for r in encode_simple_avro_ddl(df).collect()}
    create = decode_message(bytes.fromhex(out[10]))["payload"]
    drop = decode_message(bytes.fromhex(out[11]))["payload"]
    alter = decode_message(bytes.fromhex(out[12]))["payload"]
    assert create["type"] == "CREATE" and drop["type"] == "ERASE"
    assert alter["type"] == "ALTER"
    assert create["sql"] == "CREATE TABLE x (id INT)"
    # presence rule: no preTableSchema on CREATE, no tableSchema on ERASE
    assert create["tableSchema"] is not None
    assert create["preTableSchema"] is None
    assert drop["tableSchema"] is None
    assert drop["preTableSchema"] is not None
    assert alter["tableSchema"] is not None
    assert alter["preTableSchema"] is not None


def test_ddl_enum_order_is_getddltype():
    assert DDL_TYPES == ("CREATE", "ALTER", "ERASE", "RENAME", "TRUNCATE",
                         "CINDEX", "DINDEX", "QUERY")


@pytest.mark.slow
def test_checksum_holder_roundtrip(spark, sf_dir):
    from tigate_spark.catalog import get_catalog

    hx = (get_catalog()["encoder_simple_avro_checksum"]
          .builder(spark, sf_dir).first()["message_hex"])
    p = decode_message(bytes.fromhex(hx))["payload"]
    ck = p["checksum"]
    assert ck is not None and ck["version"] == 1
    assert ck["corrupted"] is False
    assert 0 <= ck["current"] < 2**32
    assert 0 <= ck["previous"] < 2**32


def test_message_schema_union_order():
    """Message.payload union order must equal the MessageType enum order
    (the decoder relies on index == kind)."""
    ptype = dict(MESSAGE_SCHEMA["fields"])["payload"]
    assert ptype == ["Watermark", "Bootstrap", "DDL", "DML"]


def test_full_domain_pk_table_id_tso_roundtrip(spark):
    """r12 ADVICE (medium): capped varint ladders silently truncated
    pk >= 8192 and table_id >= 8192 into plausible-but-wrong wire bytes.
    Real auto-increment pks, globally-allocated TiDB table ids, and
    TSO-scale timestamps (physical_ms << 18 ~ 2^59) must all round-trip
    exactly through the public encoder."""
    tso = (1704067200000 << 18) + 42          # realistic TiDB TSO
    cases = [(8192, 101, 1704067200000000),
             (1_000_000, 65_537, 1704067200000000),
             (2**62 + 3, 2**40 + 1, tso),
             (2**63 - 1, 8191, 1704067200000000)]
    df = spark.createDataFrame(
        [(i, "app", f"t{tid}", tid, "I", ts, pk, "ev", 5, 13)
         for i, (pk, tid, ts) in enumerate(cases)],
        "seq LONG, schema_name STRING, table_name STRING, table_id LONG, "
        "op STRING, commit_ts LONG, pk LONG, event_type STRING, "
        "value_cents LONG, user_id LONG")
    got = {r["seq"]: r for r in decode_simple_avro_rows(
        encode_simple_avro(df).select("seq", "message_hex")).collect()}
    for i, (pk, tid, ts) in enumerate(cases):
        assert got[i]["pk"] == pk
        assert got[i]["table_id"] == tid
        assert got[i]["commit_ts"] == ts


def test_null_union_consumer_roundtrip(spark):
    """r12 ADVICE (low): the consumer must decode the null union branch
    the paired encoder emits for NULL value_cents/updated_at — record
    wrappers unwrap conditionally instead of raising TypeError."""
    df = spark.createDataFrame(
        [(1, "app", "t1", 1, "I", 1704067200000000, 7, None, None, None)],
        "seq LONG, schema_name STRING, table_name STRING, table_id LONG, "
        "op STRING, commit_ts LONG, pk LONG, event_type STRING, "
        "value_cents LONG, user_id LONG")
    row = decode_simple_avro_rows(
        encode_simple_avro(df).select("seq", "message_hex")).first()
    assert row["pk"] == 7
    assert row["event_type"] is None
    assert row["value_cents"] is None
    assert row["user_id"] is None


def test_null_columns_take_the_null_union_branch(spark):
    """A NULL payload column encodes as the value union's null branch
    (encodeValue4Avro nil → "null"), not a NULL message."""
    df = spark.createDataFrame(
        [("app", "t1", 1, "I", 1704067200000000, 7, None, None, 13)],
        "schema_name STRING, table_name STRING, table_id LONG, op STRING, "
        "commit_ts LONG, pk LONG, event_type STRING, value_cents LONG, "
        "user_id LONG")
    hx = encode_simple_avro(df).first()["message_hex"]
    assert hx is not None
    data = decode_message(bytes.fromhex(hx))["payload"]["data"]
    assert data["event_type"] is None
    assert data["value_cents"] is None
    assert data["pk"] == 7 and data["user_id"] == 13


# -- large-message lanes: handle-key-only + claim-check ----------------------

def test_large_message_degraded_wire_fills_union_holders(spark, changes):
    """Oversized messages re-marshal with onlyHandleKey=true and (for
    claim-check) claimCheckLocation set — avro.go:261-271 fills BOTH
    holders; pk is the only surviving image column."""
    from tigate_spark.functions.simple_avro import encode_simple_avro_large

    enc = encode_simple_avro_large(
        changes, "claim-check", keep=("sa_oversized", "sa_loc"))
    rows = enc.select("op", "message_hex", "sa_oversized",
                      "sa_loc").limit(400).collect()
    saw_degraded = saw_inline = False
    for r in rows:
        p = decode_message(bytes.fromhex(r["message_hex"]))["payload"]
        if r["sa_oversized"]:
            saw_degraded = True
            assert p["handleKeyOnly"] is True
            assert p["claimCheckLocation"] == r["sa_loc"]
            assert p["claimCheckLocation"].startswith("s3://claim-check/")
            img = p["old"] if r["op"] == "D" else p["data"]
            assert set(img) == {"pk"}
        else:
            saw_inline = True
            assert p["handleKeyOnly"] is None
            assert p["claimCheckLocation"] is None
    assert saw_degraded and saw_inline


def test_handle_key_only_lane_has_no_location(spark, changes):
    from tigate_spark.functions.simple_avro import (
        decode_simple_avro_large,
        encode_simple_avro_large,
    )

    wire = encode_simple_avro_large(changes, "handle-key-only") \
        .select("seq", "message_hex").limit(300)
    dec = decode_simple_avro_large(wire).collect()
    degraded = [r for r in dec if r["only_handle_key"] == 1]
    assert degraded and all(r["claim_location"] is None for r in dec)
    for r in degraded:
        assert r["pk"] is not None
        assert r["event_type"] is None and r["value_cents"] is None


@pytest.mark.slow
def test_claim_check_fetch_back_restores_full_bytes(spark, changes):
    """The stored full wire decodes identical to the never-degraded
    encoding of the same row."""
    from tigate_spark.functions.simple_avro import encode_simple_avro_large

    enc = encode_simple_avro_large(
        changes, "claim-check",
        keep=("sa_oversized", "sa_loc", "sa_full_h")).limit(500)
    full = encode_simple_avro(changes).select(
        "seq", F.col("message_hex").alias("expect_hex")).limit(500)
    joined = enc.filter(F.col("sa_oversized") == 1) \
        .select("seq", "sa_full_h").join(full, "seq").collect()
    assert joined
    for r in joined:
        assert r["sa_full_h"] == r["expect_hex"]


# -- simple-protocol JSON large-message lanes (the Avro lanes' siblings) -----

def test_simple_json_large_message_lanes(spark, sf_dir):
    """simple/message.go:488-492 omitempty fields on the JSON wire:
    oversized messages degrade to pk-only images with handleKeyOnly
    (+claimCheckLocation in claim-check mode); the consumer reads them
    back per decoder.go:141-147 and the fetch-back restores full
    bytes."""
    from tigate_spark.functions.encoders import (
        decode_simple_protocol_large,
        encode_simple_protocol_large,
    )

    ch = changes_stream(spark, sf_dir, with_images=True).limit(400)
    enc = encode_simple_protocol_large(ch, threshold=215,
                                   handle="claim-check")
    rows = enc.select("op", "message", "offloaded", "claim_addr",
                      "full_message").collect()
    import json as _json

    saw_deg = saw_full = False
    for r in rows:
        m = _json.loads(r["message"])
        if r["offloaded"]:
            saw_deg = True
            assert m["handleKeyOnly"] is True
            assert m["claimCheckLocation"] == r["claim_addr"]
            img = m.get("data") or m.get("old")
            assert set(img) == {"pk"}
        else:
            saw_full = True
            assert "handleKeyOnly" not in m  # omitempty
            assert "claimCheckLocation" not in m
    assert saw_deg and saw_full
    # consumer surfaces the degrade signals
    dec = decode_simple_protocol_large(enc.select("message")).collect()
    deg = [r for r in dec if r["only_handle_key"] == 1]
    assert deg and all(r["claim_location"] for r in deg)
    assert all(r["value_cents"] is None and r["pk"] is not None
               for r in deg)
    # fetch-back: the stored full message re-decodes to the source row
    from tigate_spark.functions.encoders import decode_simple_protocol

    store = enc.filter("offloaded = 1").select(
        F.col("full_message").alias("message"))
    refull = decode_simple_protocol(store)
    assert refull.filter("value_cents IS NULL").count() == 0
    assert refull.count() == len(deg)


def test_simple_json_handle_key_only_mode(spark, sf_dir):
    from tigate_spark.functions.encoders import (
        decode_simple_protocol_large,
        encode_simple_protocol_large,
    )

    ch = changes_stream(spark, sf_dir, with_images=True).limit(300)
    enc = encode_simple_protocol_large(ch, threshold=215,
                                       handle="handle-key-only")
    dec = decode_simple_protocol_large(enc.select("message")).collect()
    deg = [r for r in dec if r["only_handle_key"] == 1]
    assert deg and all(r["claim_location"] is None for r in dec)
