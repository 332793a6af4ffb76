"""Golden decode test for craft MULTI-event messages: an independent
Python decoder implementing the reference's batch layout
(message_encoder.go:268-303 encodeHeaders + encodeRowChangeEvents +
encodeSizeTables; model.go:188-205 columnar Headers) must recover every
event from the Spark-encoded batch message."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from tigate_spark.functions.craft_decoder import (
    decode_craft_batch,
    delta_varint_chunk as _delta_varint_chunk,
    uvarint as _uvarint,
    uvarint_reversed_tail as _uvarint_reversed_tail,
    varint as _varint,
)


def _mk_row(seq, op, ts, pk, cents):
    new_img, old_img = op in ("I", "U"), op in ("U", "D")
    return Row(
        seq=seq, op=op, schema_name="app", table_name="t3", commit_ts=ts,
        after_pk=pk if new_img else None,
        after_event_type="purchase" if new_img else None,
        after_value_cents=cents if new_img else None,
        after_user_id=424242 if new_img else None,
        before_pk=pk if old_img else None,
        before_event_type="purchase" if old_img else None,
        before_value_cents=cents - 100 if old_img else None,
        before_user_id=424242 if old_img else None,
    )


_SCHEMA = (
    "seq long, op string, schema_name string, table_name string, "
    "commit_ts long, "
    "after_pk long, after_event_type string, after_value_cents long, "
    "after_user_id long, before_pk long, before_event_type string, "
    "before_value_cents long, before_user_id long"
)

ROWS = [
    _mk_row(1, "I", 1723600000123456, 11, 1000),
    _mk_row(2, "U", 1723600000123500, 12, 2000),
    _mk_row(3, "D", 1723600000999999, 13, 3000),
    _mk_row(4, "I", 1723600001000000, 14, 4000),
    _mk_row(5, "U", 1723600001000001, 15, 5000),
]


@pytest.fixture(scope="module")
def batch_msg(spark):
    from tigate_spark.functions.craft import encode_craft_batch

    df = spark.createDataFrame(ROWS, schema=_SCHEMA)
    out = encode_craft_batch(df, max_batch_size=16).collect()
    assert len(out) == 1, "one lane, one batch"
    return out[0]


def test_batch_decodes_every_event(batch_msg):
    m = decode_craft_batch(bytes.fromhex(batch_msg["message_hex"]))
    assert batch_msg["n_events"] == 5 and batch_msg["max_seq"] == 5
    assert len(m["events"]) == 5
    for row, ev in zip(ROWS, m["events"]):  # sorted by (ts, seq) = input order
        assert ev["ts"] == row.commit_ts
        assert ev["type"] == 1 and ev["partition"] == -1
        assert ev["schema"] == "app" and ev["table"] == "t3"
        expected = ({0x1} if row.op == "I" else
                    {0x2} if row.op == "D" else {0x1, 0x2})
        assert set(ev["groups"]) == expected
        for gty, img in ((0x1, "after"), (0x2, "before")):
            if gty not in ev["groups"]:
                continue
            g = ev["groups"][gty]
            assert g["types"] == [8, 15, 8, 8]
            assert g["cols"]["pk"] == getattr(row, f"{img}_pk")
            assert g["cols"]["value_cents"] == getattr(row, f"{img}_value_cents")


def test_batch_rolls_at_max_size(spark):
    from tigate_spark.functions.craft import encode_craft_batch

    df = spark.createDataFrame(ROWS, schema=_SCHEMA)
    out = encode_craft_batch(df, max_batch_size=2).orderBy("batch_seq").collect()
    assert [r["n_events"] for r in out] == [2, 2, 1]
    for r in out:
        m = decode_craft_batch(bytes.fromhex(r["message_hex"]))
        assert len(m["events"]) == r["n_events"]


def test_batch_plan_stays_jvm_side(spark):
    from tigate_spark.functions.craft import encode_craft_batch

    df = spark.createDataFrame(ROWS, schema=_SCHEMA)
    plan = (encode_craft_batch(df)._jdf.queryExecution()
            .executedPlan().toString())
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_craft_resolved_golden(spark):
    """Resolved-ts craft message: type=3, null partition/schema/table,
    empty dictionary, [hdr,1]+[0] size tables (message_encoder.go:305-314)."""
    from tigate_spark.functions.craft import encode_craft_resolved

    df = spark.createDataFrame([Row(topic="app_t0", resolved_ts=1723600000123456)])
    raw = bytes.fromhex(encode_craft_resolved(df).first()["message_hex"])
    version, i = _uvarint(raw, 0)
    assert version == 1
    st_size, nrev = _uvarint_reversed_tail(raw)
    tb, j = raw[len(raw) - nrev - st_size:len(raw) - nrev], 0
    tables = []
    while j < len(tb):
        n, j = _uvarint(tb, j)
        chunk, j = _delta_varint_chunk(tb, j, n)
        tables.append(chunk)
    assert len(tables) == 2, "meta + body only, no group tables"
    hdr_size, dict_size = tables[0]
    assert dict_size == 1 and tables[1] == [0]
    ts, i = _uvarint(raw, i)
    ty, i = _uvarint(raw, i)
    (partition,), i = _delta_varint_chunk(raw, i, 1)
    (schema_id,), i = _delta_varint_chunk(raw, i, 1)
    (table_id,), i = _delta_varint_chunk(raw, i, 1)
    assert ts == 1723600000123456 and ty == 3
    assert partition == schema_id == table_id == -1
    # empty dictionary immediately after headers
    ndict, i = _uvarint(raw, i)
    assert ndict == 0
    assert i == len(raw) - nrev - st_size


def test_open_resolved_golden(spark):
    """Open-protocol checkpoint: [8B version][8B keyLen][{"ts":N,"t":3}]
    key, zero-length value word (open/codec.go:149-178)."""
    import json
    from tigate_spark.functions.encoders import encode_open_resolved

    df = spark.createDataFrame([Row(topic="app_t0", resolved_ts=97)])
    r = encode_open_resolved(df).first()
    key = bytes.fromhex(r["key_hex"])
    assert int.from_bytes(key[0:8], "big") == 1
    klen = int.from_bytes(key[8:16], "big")
    payload = key[16:]
    assert len(payload) == klen
    assert json.loads(payload) == {"ts": 97, "t": 3}
    assert bytes.fromhex(r["value_hex"]) == b"\x00" * 8
