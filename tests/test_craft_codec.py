"""Golden decode test for the craft codec: an independent Python decoder
implementing the reference's decode algorithm (message_decoder.go —
tail-in size tables, term dictionary, delta/zigzag chunks, column groups)
must recover every field from the Spark-encoded message."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

# the decoder lives in the engine package now (consumer-side E7 surface);
# it stays independent of the hex-generating encoder SQL
from tigate_spark.functions.craft_decoder import (  # noqa: F401
    decode_craft,
    delta_varint_chunk as _delta_varint_chunk,
    uvarint as _uvarint,
    uvarint_reversed_tail as _uvarint_reversed_tail,
    varint as _varint,
)


_SCHEMA = (
    "op string, schema_name string, table_name string, commit_ts long, "
    "after_pk long, after_event_type string, after_value_cents long, "
    "after_user_id long, before_pk long, before_event_type string, "
    "before_value_cents long, before_user_id long"
)


@pytest.mark.parametrize("op", ["I", "U", "D"])
def test_craft_roundtrip_golden(spark, op):
    from tigate_spark.functions.craft import encode_craft_row

    new_img, old_img = op in ("I", "U"), op in ("U", "D")
    row = Row(
        op=op, schema_name="app", table_name="t3", commit_ts=1723600000123456,
        after_pk=187 if new_img else None,
        after_event_type="purchase" if new_img else None,
        after_value_cents=123456 if new_img else None,
        after_user_id=424242 if new_img else None,
        before_pk=187 if old_img else None,
        before_event_type="purchase" if old_img else None,
        before_value_cents=123356 if old_img else None,
        before_user_id=424242 if old_img else None,
    )
    df = spark.createDataFrame([row], schema=_SCHEMA)
    hexmsg = encode_craft_row(df).first()["message_hex"]
    m = decode_craft(bytes.fromhex(hexmsg))
    assert m["ts"] == 1723600000123456
    assert m["type"] == 1  # MessageTypeRow
    assert m["partition"] == -1
    assert m["schema"] == "app" and m["table"] == "t3"
    expected_groups = {0x1} if op == "I" else {0x2} if op == "D" else {0x1, 0x2}
    assert set(m["groups"]) == expected_groups
    for gty, img in ((0x1, "after"), (0x2, "before")):
        if gty not in m["groups"]:
            continue
        g = m["groups"][gty]
        assert g["types"] == [8, 15, 8, 8]
        assert g["flags"] == [10, 64, 64, 64]
        assert g["cols"]["pk"] == 187
        assert g["cols"]["event_type"] == "purchase"
        assert g["cols"]["user_id"] == 424242
        assert g["cols"]["value_cents"] == (123456 if img == "after" else 123356)


def test_craft_plan_stays_jvm_side(spark):
    """The craft encoder must be pure column expressions — no Python UDF
    in the plan."""
    from tigate_spark.functions.craft import encode_craft_row

    df = spark.createDataFrame([Row(
        op="I", schema_name="app", table_name="t0", commit_ts=1,
        after_pk=1, after_event_type="x", after_value_cents=1, after_user_id=1,
        before_pk=None, before_event_type=None, before_value_cents=None,
        before_user_id=None,
    )], schema=_SCHEMA)
    plan = encode_craft_row(df)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_craft_roundtrip_non_ascii(spark):
    """UTF-8 multi-byte strings: term-dictionary and value lengths are
    BYTE lengths (octet_length), so non-ASCII schema/table/varchar values
    must survive the round trip (the reference's craft strings are Go
    []byte — byte-addressed)."""
    row = Row(
        op="I", schema_name="应用", table_name="τράπεζα",
        commit_ts=1723600000123456,
        after_pk=1, after_event_type="käufe—日本語",
        after_value_cents=5, after_user_id=9,
        before_pk=None, before_event_type=None,
        before_value_cents=None, before_user_id=None,
    )
    from tigate_spark.functions.craft import encode_craft_row

    df = spark.createDataFrame([row], schema=_SCHEMA)
    m = decode_craft(bytes.fromhex(encode_craft_row(df).first()["message_hex"]))
    assert m["schema"] == "应用" and m["table"] == "τράπεζα"
    assert m["groups"][1]["cols"]["event_type"] == "käufe—日本語"
