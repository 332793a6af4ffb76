"""Golden decode test for the Confluent Avro wire framing: an
independent Python Avro-binary decoder (spec §binary encoding — zigzag
varint longs, length-prefixed strings, union branch indexes) must
recover every field from the Spark-encoded message, and the 5-byte
Confluent header (confluent_schema_registry.go:400-408) must carry the
magic byte and the registered schema id."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

# the decoder lives in the engine package now (consumer-side E7 surface);
# it stays independent of the hex-generating encoder SQL
from tigate_spark.functions.avro_wire import (  # noqa: F401
    KEY_SCHEMA_ID,
    VALUE_SCHEMA_ID,
    avro_long as _avro_long,
    avro_string as _avro_string,
    decode_avro_value as decode_value,
    encode_avro_confluent,
    strip_confluent_header as _strip_header,
)


ROWS = [
    Row(seq=1, op="I", pk=7, event_type="click", value_cents=12345,
        user_id=42, commit_ts=1_700_000_000_123_456),
    Row(seq=2, op="U", pk=0, event_type="päge", value_cents=0,
        user_id=2**40, commit_ts=999),
    Row(seq=3, op="D", pk=199, event_type="x", value_cents=1,
        user_id=1, commit_ts=1_000),
]


@pytest.fixture(scope="module")
def encoded(spark):
    df = encode_avro_confluent(spark.createDataFrame(ROWS))
    return {r["seq"]: r for r in df.collect()}


def test_key_frames_decode(encoded):
    for row in ROWS:
        body = _strip_header(bytes.fromhex(encoded[row.seq]["key_hex"]),
                             KEY_SCHEMA_ID)
        pk, i = _avro_long(body, 0)
        assert (pk, i) == (row.pk, len(body))


def test_value_frames_decode(encoded):
    for row in ROWS:
        if row.op == "D":
            continue
        got = decode_value(bytes.fromhex(encoded[row.seq]["value_hex"]))
        assert got == dict(
            pk=row.pk, event_type=row.event_type,
            value_cents=row.value_cents, user_id=row.user_id,
            op="c" if row.op == "I" else "u", commit_ts=row.commit_ts,
            phys=row.commit_ts // 1000,
        )


def test_delete_is_tombstone(encoded):
    assert encoded[3]["value_hex"] is None
    assert encoded[3]["key_hex"] is not None


def test_no_python_in_plan(spark):
    df = encode_avro_confluent(spark.createDataFrame(ROWS))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_open_ddl_matches_reference_golden(spark):
    """open/codec_test.go:211: value[8:] must equal
    {"q":"<query>","t":3} for a create-table DDL."""
    import json
    from tigate_spark.functions.encoders import encode_open_ddl

    q = "create table test.t(a tinyint primary key, b int)"
    df = spark.createDataFrame([Row(
        seq=1, commit_ts=427, schema_name="test", table_name="t",
        ddl_type="create table", query=q,
    )])
    r = encode_open_ddl(df).first()
    value = bytes.fromhex(r["value_hex"])
    assert int.from_bytes(value[0:8], "big") == len(value) - 8
    assert value[8:].decode() == f'{{"q":"{q}","t":3}}'
    key = bytes.fromhex(r["key_hex"])
    assert int.from_bytes(key[0:8], "big") == 1
    klen = int.from_bytes(key[8:16], "big")
    assert json.loads(key[16:16 + klen]) == {
        "ts": 427, "scm": "test", "tbl": "t", "t": 2}
