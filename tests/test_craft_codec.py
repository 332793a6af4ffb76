"""Golden decode test for the craft codec: an independent Python decoder
implementing the reference's decode algorithm (message_decoder.go —
tail-in size tables, term dictionary, delta/zigzag chunks, column groups)
must recover every field from the Spark-encoded message."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F


def _uvarint(b: bytes, i: int) -> tuple[int, int]:
    x, s = 0, 0
    while True:
        x |= (b[i] & 0x7F) << s
        s += 7
        i += 1
        if not b[i - 1] & 0x80:
            return x, i


def _varint(b: bytes, i: int) -> tuple[int, int]:
    u, i = _uvarint(b, i)
    return (u >> 1) ^ -(u & 1), i


def _uvarint_reversed_tail(b: bytes) -> tuple[int, int]:
    # decodeUvarintReversed reads from the END of the buffer
    x, s, n = 0, 0, 0
    i = len(b) - 1
    while True:
        x |= (b[i] & 0x7F) << s
        s += 7
        n += 1
        if not b[i] & 0x80:
            return x, n
        i -= 1


def _delta_varint_chunk(b: bytes, i: int, n: int) -> tuple[list[int], int]:
    out = []
    last = 0
    for k in range(n):
        v, i = _varint(b, i)
        last = v if k == 0 else last + v
        out.append(last)
    return out, i


def decode_craft(raw: bytes) -> dict:
    """Single-event craft message decoder (reference algorithm)."""
    version, i = _uvarint(raw, 0)
    assert version == 1
    # size tables from the tail (decodeSizeTables)
    st_size, nrev = _uvarint_reversed_tail(raw)
    tables_start = len(raw) - nrev - st_size
    tb, j = raw[tables_start:len(raw) - nrev], 0
    tables = []
    while j < len(tb):
        n, j = _uvarint(tb, j)
        chunk, j = _delta_varint_chunk(tb, j, n)
        tables.append(chunk)
    meta, body_sizes = tables[0], tables[1]
    hdr_size, dict_size = meta[0], meta[1]
    body_total = sum(body_sizes)
    # term dictionary sits after header+body
    dict_off = i + hdr_size + body_total
    db, dj = raw[dict_off:dict_off + dict_size], 0
    ndict, dj = _uvarint(db, dj)
    lens = []
    for _ in range(ndict):
        ln, dj = _uvarint(db, dj)
        lens.append(ln)
    terms = []
    for ln in lens:
        terms.append(db[dj:dj + ln].decode())
        dj += ln
    # headers (single event)
    ts, i = _uvarint(raw, i)
    ty, i = _uvarint(raw, i)
    (partition,), i = _delta_varint_chunk(raw, i, 1)
    (schema_id,), i = _delta_varint_chunk(raw, i, 1)
    (table_id,), i = _delta_varint_chunk(raw, i, 1)
    # column groups
    groups = {}
    for gsize in tables[2]:
        g_end = i + gsize
        gty = raw[i]
        i += 1
        ncols, i = _uvarint(raw, i)
        name_ids, i = _delta_varint_chunk(raw, i, ncols)
        types, flags = [], []
        for _ in range(ncols):
            t, i = _uvarint(raw, i)
            types.append(t)
        for _ in range(ncols):
            f, i = _uvarint(raw, i)
            flags.append(f)
        vlens = []
        for _ in range(ncols):
            ln, i = _varint(raw, i)
            vlens.append(ln)
        cols = {}
        for k in range(ncols):
            name = terms[name_ids[k]]
            if vlens[k] < 0:
                cols[name] = None
            elif types[k] == 15:
                cols[name] = raw[i:i + vlens[k]].decode()
                i += vlens[k]
            else:
                v, i2 = _varint(raw, i)
                assert i2 - i == vlens[k]
                cols[name] = v
                i = i2
        assert i == g_end, (i, g_end)
        groups[gty] = {"types": types, "flags": flags, "cols": cols}
    return {
        "ts": ts, "type": ty, "partition": partition,
        "schema": terms[schema_id], "table": terms[table_id],
        "groups": groups,
    }


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
