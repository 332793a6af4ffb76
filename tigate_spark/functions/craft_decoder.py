"""Consumer-side craft codec decoders (E7 for the craft protocol).

An independent Python implementation of the reference's decode algorithm
(``pkg/sink/codec/craft/message_decoder.go`` — tail-in size tables closed
by a byte-reversed uvarint, encounter-order term dictionary, delta/zigzag
varint chunks, typed old/new column groups; batch layout per
``message_encoder.go:268-303`` columnar headers). It is deliberately NOT
derived from the hex-generating SQL in :mod:`tigate_spark.functions.craft`
— encoder and decoder meet only at the byte level, so a round-trip proves
the framing, not a shared bug.

The Spark surface (:func:`craft_decode_rows`, :func:`craft_decode_batches`)
runs the decoder over Arrow batches via ``mapInPandas`` — the engine's
documented Python extension path (SURVEY §2.9): binary protocol parsing is
the one place a generated SQL expression cannot reasonably go, exactly like
the reference's consumer-side decoders live outside its encoder package.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


# ---------------------------------------------------------------------------
# byte-level primitives (message_decoder.go)
# ---------------------------------------------------------------------------
def uvarint(b: bytes, i: int) -> tuple[int, int]:
    x, s = 0, 0
    while True:
        x |= (b[i] & 0x7F) << s
        s += 7
        i += 1
        if not b[i - 1] & 0x80:
            return x, i


def varint(b: bytes, i: int) -> tuple[int, int]:
    u, i = uvarint(b, i)
    return (u >> 1) ^ -(u & 1), i


def uvarint_reversed_tail(b: bytes) -> tuple[int, int]:
    """``decodeUvarintReversed`` — reads from the END of the buffer."""
    x, s, n = 0, 0, 0
    i = len(b) - 1
    while True:
        x |= (b[i] & 0x7F) << s
        s += 7
        n += 1
        if not b[i] & 0x80:
            return x, n
        i -= 1


def delta_varint_chunk(b: bytes, i: int, n: int) -> tuple[list[int], int]:
    out: list[int] = []
    last = 0
    for k in range(n):
        v, i = varint(b, i)
        last = v if k == 0 else last + v
        out.append(last)
    return out, i


def delta_uvarint_chunk(b: bytes, i: int, n: int) -> tuple[list[int], int]:
    out: list[int] = []
    last = 0
    for k in range(n):
        v, i = uvarint(b, i)
        last = v if k == 0 else last + v
        out.append(last)
    return out, i


def _parse_group(raw: bytes, i: int, gsize: int,
                 terms: list[str]) -> tuple[int, dict, int]:
    g_end = i + gsize
    gty = raw[i]
    i += 1
    ncols, i = uvarint(raw, i)
    name_ids, i = delta_varint_chunk(raw, i, ncols)
    types, flags = [], []
    for _ in range(ncols):
        t, i = uvarint(raw, i)
        types.append(t)
    for _ in range(ncols):
        f, i = uvarint(raw, i)
        flags.append(f)
    vlens = []
    for _ in range(ncols):
        ln, i = varint(raw, i)
        vlens.append(ln)
    cols: dict = {}
    for k in range(ncols):
        name = terms[name_ids[k]]
        if vlens[k] < 0:
            cols[name] = None
        elif types[k] == 15:
            cols[name] = raw[i:i + vlens[k]].decode()
            i += vlens[k]
        else:
            v, i2 = varint(raw, i)
            if i2 - i != vlens[k]:
                raise ValueError(
                    f"craft: column {k} varint width {i2 - i} != declared {vlens[k]}")
            cols[name] = v
            i = i2
    if i != g_end:
        raise ValueError(f"craft: group parse ended at {i}, expected {g_end}")
    return gty, {"types": types, "flags": flags, "cols": cols}, i


def _size_tables_and_dict(raw: bytes, i: int) -> tuple[list, list[str], int]:
    """Shared prologue: tail size tables + term dictionary."""
    st_size, nrev = uvarint_reversed_tail(raw)
    tables_start = len(raw) - nrev - st_size
    if tables_start < i or st_size <= 0:
        raise ValueError(
            f"craft: size-table start {tables_start} out of bounds "
            f"(payload starts at {i}, len {len(raw)})")
    tb, j = raw[tables_start:len(raw) - nrev], 0
    tables: list = []
    while j < len(tb):
        n, j = uvarint(tb, j)
        chunk, j = delta_varint_chunk(tb, j, n)
        tables.append(chunk)
    if len(tables) < 2 or len(tables[0]) < 2:
        raise ValueError(f"craft: malformed size tables ({len(tables)} chunks)")
    meta, body_sizes = tables[0], tables[1]
    hdr_size, dict_size = meta[0], meta[1]
    dict_off = i + hdr_size + sum(body_sizes)
    if dict_off + dict_size > tables_start or hdr_size < 0 or dict_size < 0:
        raise ValueError(
            f"craft: dictionary [{dict_off}, {dict_off + dict_size}) "
            f"overlaps size tables at {tables_start}")
    db, dj = raw[dict_off:dict_off + dict_size], 0
    ndict, dj = uvarint(db, dj)
    lens = []
    for _ in range(ndict):
        ln, dj = uvarint(db, dj)
        lens.append(ln)
    terms = []
    for ln in lens:
        terms.append(db[dj:dj + ln].decode())
        dj += ln
    return tables, terms, i


def decode_craft(raw: bytes) -> dict:
    """Single-event craft message decoder (reference algorithm)."""
    version, i = uvarint(raw, 0)
    if version != 1:
        raise ValueError(f"craft: unsupported version {version}")
    tables, terms, i = _size_tables_and_dict(raw, i)
    ts, i = uvarint(raw, i)
    ty, i = uvarint(raw, i)
    (partition,), i = delta_varint_chunk(raw, i, 1)
    (schema_id,), i = delta_varint_chunk(raw, i, 1)
    (table_id,), i = delta_varint_chunk(raw, i, 1)
    groups: dict = {}
    for gsize in tables[2]:
        gty, g, i = _parse_group(raw, i, gsize, terms)
        groups[gty] = g
    return {
        "ts": ts, "type": ty, "partition": partition,
        "schema": terms[schema_id], "table": terms[table_id],
        "groups": groups,
    }


def decode_craft_batch(raw: bytes) -> dict:
    """Multi-event craft message decoder (reference batch algorithm)."""
    version, i = uvarint(raw, 0)
    if version != 1:
        raise ValueError(f"craft: unsupported version {version}")
    tables, terms, i = _size_tables_and_dict(raw, i)
    body_sizes = tables[1]
    n_events = len(body_sizes)
    if len(tables) != 2 + n_events:
        raise ValueError(
            f"craft: {len(tables)} size tables for {n_events} events")
    ts, i = delta_uvarint_chunk(raw, i, n_events)
    ty = []
    for _ in range(n_events):
        t, i = uvarint(raw, i)
        ty.append(t)
    partition, i = delta_varint_chunk(raw, i, n_events)
    schema_ids, i = delta_varint_chunk(raw, i, n_events)
    table_ids, i = delta_varint_chunk(raw, i, n_events)
    events = []
    for e in range(n_events):
        body_end = i + body_sizes[e]
        groups: dict = {}
        for gsize in tables[2 + e]:
            gty, g, i = _parse_group(raw, i, gsize, terms)
            groups[gty] = g
        if i != body_end:
            raise ValueError(
                f"craft: event body ended at {i}, expected {body_end}")
        events.append({
            "ts": ts[e], "type": ty[e], "partition": partition[e],
            "schema": terms[schema_ids[e]], "table": terms[table_ids[e]],
            "groups": groups,
        })
    return {"events": events}


# ---------------------------------------------------------------------------
# Spark surface (Arrow mapInPandas — SURVEY §2.9 extension path)
# ---------------------------------------------------------------------------
_ROW_OUT_SCHEMA = (
    "seq long, schema_name string, table_name string, commit_ts long, "
    "op string, pk long, event_type string, value_cents long, user_id long"
)


def _event_fields(m: dict) -> tuple:
    g = m["groups"]
    op = "U" if 1 in g and 2 in g else ("I" if 1 in g else "D")
    img = g[1]["cols"] if op in ("I", "U") else g[2]["cols"]
    return (
        m["schema"], m["table"], m["ts"], op,
        img.get("pk"), img.get("event_type"),
        img.get("value_cents"), img.get("user_id"),
    )


_ROW_DL_SCHEMA = _ROW_OUT_SCHEMA + ", decode_ok long"


def craft_decode_rows(df: DataFrame, hex_col: str = "message_hex",
                      dead_letter: bool = False) -> DataFrame:
    """Decode single-event craft messages back into change rows.

    Arrow-batched ``mapInPandas``: the decoder sees a pandas frame per
    batch and emits one typed row per message — per-partition, no
    shuffle, linear in message bytes at any scale.

    ``dead_letter=True`` adds a ``decode_ok`` column and converts
    per-message decode failures (truncated/garbled bytes) into
    null-field rows with ``decode_ok = 0`` instead of failing the task —
    the consumer-side dead-letter pattern of the reference's decoder
    tests (a poisoned message must not stall the changefeed).
    """
    import pandas as pd

    cols = [
        "seq", "schema_name", "table_name", "commit_ts", "op",
        "pk", "event_type", "value_cents", "user_id",
    ]

    def fn(it):
        for pdf in it:
            rows = []
            for seq, h in zip(pdf["seq"], pdf[hex_col]):
                if not dead_letter:
                    rows.append(
                        (int(seq),
                         *_event_fields(decode_craft(bytes.fromhex(h))))
                    )
                    continue
                try:
                    rows.append(
                        (int(seq),
                         *_event_fields(decode_craft(bytes.fromhex(h))), 1)
                    )
                except Exception:
                    rows.append((int(seq), *([None] * 8), 0))
            out_cols = cols + (["decode_ok"] if dead_letter else [])
            yield pd.DataFrame(rows, columns=out_cols)

    return df.mapInPandas(
        fn, _ROW_DL_SCHEMA if dead_letter else _ROW_OUT_SCHEMA
    )


_BATCH_OUT_SCHEMA = (
    "schema_name string, table_name string, batch_seq long, "
    "event_idx long, commit_ts long, op string, pk long, "
    "event_type string, value_cents long, user_id long"
)


def craft_decode_batches(df: DataFrame,
                         hex_col: str = "message_hex") -> DataFrame:
    """Decode multi-event craft batch messages; one output row per event,
    ``event_idx`` = position within the message (the encoder's
    (commit_ts, seq) lane order)."""
    import pandas as pd

    def fn(it):
        for pdf in it:
            rows = []
            for sch, tbl, bseq, h in zip(
                pdf["schema_name"], pdf["table_name"],
                pdf["batch_seq"], pdf[hex_col],
            ):
                m = decode_craft_batch(bytes.fromhex(h))
                for idx, ev in enumerate(m["events"]):
                    rows.append(
                        (sch, tbl, int(bseq), idx, *_event_fields(ev)[2:])
                    )
            yield pd.DataFrame(
                rows, columns=[
                    "schema_name", "table_name", "batch_seq", "event_idx",
                    "commit_ts", "op", "pk", "event_type", "value_cents",
                    "user_id",
                ],
            )

    return df.mapInPandas(fn, _BATCH_OUT_SCHEMA)
