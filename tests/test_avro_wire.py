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


# -- AWS Glue registry framing (glue_schema_registry.go:326-353) -------------

@pytest.fixture(scope="module")
def glue_encoded(spark):
    from tigate_spark.functions.avro_wire import encode_avro_glue

    df = encode_avro_glue(spark.createDataFrame(ROWS))
    return {r["seq"]: r for r in df.collect()}


def test_glue_header_shape(glue_encoded):
    """18-byte header: version byte 3, compression byte 0, 16-byte
    schema-version UUID (AWSSchemaRegistryConstants layout)."""
    from tigate_spark.functions.avro_wire import (
        GLUE_KEY_SCHEMA_UUID,
        GLUE_VALUE_SCHEMA_UUID,
    )
    import uuid as _uuid

    k = bytes.fromhex(glue_encoded[1]["key_hex"])
    v = bytes.fromhex(glue_encoded[1]["value_hex"])
    for raw, want in ((k, GLUE_KEY_SCHEMA_UUID), (v, GLUE_VALUE_SCHEMA_UUID)):
        assert raw[0] == 3 and raw[1] == 0
        assert _uuid.UUID(bytes=raw[2:18]) == want


def test_glue_frames_decode(glue_encoded):
    """The independent Glue-header parser + shared Avro binary decoder
    recover every field; the record body is byte-identical to the
    Confluent body (the SchemaManager seam: header-only difference)."""
    from tigate_spark.functions.avro_wire import (
        decode_avro_glue_key,
        decode_avro_glue_value,
    )

    for row in ROWS:
        assert decode_avro_glue_key(
            bytes.fromhex(glue_encoded[row.seq]["key_hex"])) == row.pk
        if row.op == "D":
            assert glue_encoded[row.seq]["value_hex"] is None
            continue
        got = decode_avro_glue_value(
            bytes.fromhex(glue_encoded[row.seq]["value_hex"]))
        assert got == dict(
            pk=row.pk, event_type=row.event_type,
            value_cents=row.value_cents, user_id=row.user_id,
            op="c" if row.op == "I" else "u", commit_ts=row.commit_ts,
            phys=row.commit_ts // 1000,
        )


def test_glue_body_equals_confluent_body(encoded, glue_encoded):
    for row in ROWS:
        assert (bytes.fromhex(glue_encoded[row.seq]["key_hex"])[18:]
                == bytes.fromhex(encoded[row.seq]["key_hex"])[5:])
        if row.op != "D":
            assert (bytes.fromhex(glue_encoded[row.seq]["value_hex"])[18:]
                    == bytes.fromhex(encoded[row.seq]["value_hex"])[5:])


def test_glue_header_rejections():
    from tigate_spark.functions.avro_wire import (
        GLUE_KEY_SCHEMA_UUID,
        strip_glue_header,
    )

    good = bytes([3, 0]) + GLUE_KEY_SCHEMA_UUID.bytes + b"\x02"
    assert strip_glue_header(good, GLUE_KEY_SCHEMA_UUID) == b"\x02"
    with pytest.raises(ValueError, match="too short"):
        strip_glue_header(good[:17], GLUE_KEY_SCHEMA_UUID)
    with pytest.raises(ValueError, match="version byte"):
        strip_glue_header(bytes([0]) + good[1:], GLUE_KEY_SCHEMA_UUID)
    with pytest.raises(ValueError, match="compression"):
        strip_glue_header(bytes([3, 5]) + good[2:], GLUE_KEY_SCHEMA_UUID)
    with pytest.raises(ValueError, match="uuid"):
        strip_glue_header(good[:2] + bytes(16) + good[18:],
                          GLUE_KEY_SCHEMA_UUID)


def test_glue_no_python_in_plan(spark):
    from tigate_spark.functions.avro_wire import encode_avro_glue

    df = encode_avro_glue(spark.createDataFrame(ROWS))
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
