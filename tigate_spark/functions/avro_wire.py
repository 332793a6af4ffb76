"""Confluent Avro wire framing — byte-exact binary encoding (hex form).

The reference's Avro sink frames every Kafka message as Confluent wire
format (``pkg/sink/codec/avro/confluent_schema_registry.go:40-42,400-408``):

    [1B magic=0x00][4B BE schema id][Avro **binary** record]

and the record body is the Avro binary encoding of the key/value records
from ``pkg/sink/codec/avro/arvo.go:163-205,328-343`` — the same records
whose Avro *JSON* rendering is ``encode_avro_json``. This module closes
the "binary framing is a transport concern" gap: the full wire bytes are
produced as hex-string column expressions (JVM-side, codegen'd, zero
Python), and the DuckDB oracle is generated from the SAME step list, so
the driver hash-match proves byte-exactness.

Avro binary primitives (Avro spec §binary encoding):

- ``long``   → zigzag varint (``craft._vhex`` — protobuf and Avro share
  the encoding)
- ``string`` → long(byte length) + UTF-8 bytes
- ``union ["null", T]`` → long(branch index: 1 for non-null) + T

Value record fields in schema order (nullable columns are unions, the
handle key and the TiDB extension fields are plain):

    pk long · event_type union-string · value_cents union-long ·
    user_id union-long · _tidb_op string · _tidb_commit_ts long ·
    _tidb_commit_physical_time long

Key record: ``{pk: long}``. Deletes emit key + NULL value (Kafka
tombstone, ``arvo.go:163-166``) — the tombstone is unframed by
definition.

Schema ids come from the registry (``GetCachedOrRegister``); the
stand-in registry assigns them deterministically in first-registration
order — key subject ``<topic>-key`` = 1, value subject ``<topic>-value``
= 2 — the exact ids a fresh Confluent registry hands a single-table
changefeed.

The reference's Avro codec supports a SECOND registry, AWS Glue
(``glue_schema_registry.go:326-353``; dispatch ``arvo.go:1019-1032``):
same record body, different frame — ``[1B header version = 3]
[1B compression = 0][16B schema-version UUID]``. :func:`encode_avro_glue`
/ :func:`strip_glue_header` twin it; the stand-in registry's
schema-version UUIDs are deterministic UUIDv5s of the subject names
(the registry HTTP/AWS round-trip itself stays unmodeled, as with
Confluent).
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame

from tigate_spark.functions.craft import _dialect, _vhex

#: magic byte 0x00 + 4-byte BE schema id (confluent_schema_registry.go:400-408)
KEY_SCHEMA_ID = 1
VALUE_SCHEMA_ID = 2
_KEY_HDR = f"00{KEY_SCHEMA_ID:08X}"
_VALUE_HDR = f"00{VALUE_SCHEMA_ID:08X}"
#: union branch index 1 (non-null) as a zigzag-varint long
_UNION1 = "02"

# ---------------------------------------------------------------------------
# AWS Glue schema-registry framing (glue_schema_registry.go:326-353; registry
# dispatch arvo.go:1019-1032): [1B header version = 3][1B compression = 0]
# [16B schema-version UUID] + the SAME Avro binary record body as the
# Confluent wire. Glue identifies a registered schema version by UUID
# (GetSchemaVersionInput.SchemaVersionId), not a small integer; the stand-in
# registry assigns each subject the deterministic UUIDv5 of its subject name
# — the Glue precedent of the Confluent stand-in's first-registration ids.
# ---------------------------------------------------------------------------
GLUE_HEADER_VERSION = 3   # headerVersionByte — fixed for every glue message
GLUE_NO_COMPRESSION = 0   # compressionDefaultByte — 0 = no compression
GLUE_KEY_SCHEMA_UUID = uuid.uuid5(uuid.NAMESPACE_URL, "glue://tigate/changes-key")
GLUE_VALUE_SCHEMA_UUID = uuid.uuid5(
    uuid.NAMESPACE_URL, "glue://tigate/changes-value")
_GLUE_KEY_HDR = (f"{GLUE_HEADER_VERSION:02X}{GLUE_NO_COMPRESSION:02X}"
                 f"{GLUE_KEY_SCHEMA_UUID.hex.upper()}")
_GLUE_VALUE_HDR = (f"{GLUE_HEADER_VERSION:02X}{GLUE_NO_COMPRESSION:02X}"
                   f"{GLUE_VALUE_SCHEMA_UUID.hex.upper()}")


def avro_wire_steps(d_name: str,
                    exclude: tuple[str, ...] = (),
                    key_hdr: str = _KEY_HDR,
                    value_hdr: str = _VALUE_HDR) -> list[tuple[str, str]]:
    """Ordered (column, SQL) steps shared by the Spark builder and the
    DuckDB oracle. Expects columns: op, pk, event_type, value_cents,
    user_id, commit_ts.

    ``exclude``: payload columns a column selector deselected — the
    record schema the registry serves for the table simply lacks those
    fields, so the binary body skips their fragments entirely
    (scenario ``kafka_column_selector_avro/``: the SELECTED schema is
    the registered schema; the handle key and extension fields always
    survive, the dispatch-ability precondition).

    ``key_hdr``/``value_hdr``: the registry framing prefix as hex —
    Confluent's 5-byte magic+id by default, or the Glue 18-byte
    version+compression+UUID header (the record BODY is
    registry-agnostic, exactly the reference's SchemaManager seam)."""
    d = _dialect(d_name)
    steps: list[tuple[str, str]] = []
    # Avro string = long(byte length) + bytes
    steps.append((
        "et_h",
        f"{_vhex(d['slen']('event_type'), d, 3)} || hex(event_type)",
    ))
    op_ch = "CASE WHEN op = 'I' THEN 'c' ELSE 'u' END"
    steps.append(("op_h", f"'02' || hex({op_ch})"))
    body = [f"{_vhex('pk', d)}"]
    if "event_type" not in exclude:
        body.append(f"'{_UNION1}' || et_h")
    if "value_cents" not in exclude:
        body.append(f"'{_UNION1}' || {_vhex('value_cents', d)}")
    if "user_id" not in exclude:
        body.append(f"'{_UNION1}' || {_vhex('user_id', d)}")
    body.append(f"op_h || {_vhex('commit_ts', d)} || "
                f"{_vhex(d['idiv']('commit_ts', 1000), d)}")
    steps.append(("value_body_h", " || ".join(body)))
    steps.append((
        "key_hex",
        f"'{key_hdr}' || {_vhex('pk', d)}",
    ))
    steps.append((
        "value_hex",
        f"CASE WHEN op <> 'D' THEN '{value_hdr}' || value_body_h END",
    ))
    return steps


def encode_avro_confluent(df: DataFrame,
                          exclude: tuple[str, ...] = (),
                          key_hdr: str = _KEY_HDR,
                          value_hdr: str = _VALUE_HDR) -> DataFrame:
    """Registry-framed Avro binary key/value per change row, as hex
    strings (``unhex`` of the columns is the exact producer payload) —
    Confluent headers by default, any registry frame via the kwargs.

    Expects ``op, pk, event_type, value_cents, user_id, commit_ts``.
    Pure column expressions — whole-stage codegen, no Python on the path.
    """
    steps = avro_wire_steps("spark", exclude=exclude,
                            key_hdr=key_hdr, value_hdr=value_hdr)
    out = df.selectExpr("*", *[f"{sql} AS {name}" for name, sql in steps])
    return out.drop("et_h", "op_h", "value_body_h")


def avro_wire_oracle_suffix(exclude: tuple[str, ...] = (),
                            key_hdr: str = _KEY_HDR,
                            value_hdr: str = _VALUE_HDR) -> str:
    """DuckDB mirror: chained CTEs over an ``avro_in`` relation ending in
    ``avro_msg`` with key_hex/value_hex — any registry frame via the
    header kwargs."""
    steps = avro_wire_steps("duckdb", exclude=exclude,
                            key_hdr=key_hdr, value_hdr=value_hdr)
    sql = []
    prev = "avro_in"
    for i, (name, expr) in enumerate(steps):
        cte = "avro_msg" if i == len(steps) - 1 else f"av{i}"
        sql.append(f", {cte} AS (SELECT *, {expr} AS {name} FROM {prev})")
        prev = cte
    return "".join(sql)


def encode_avro_glue(df: DataFrame,
                     exclude: tuple[str, ...] = ()) -> DataFrame:
    """Glue-framed Avro binary key/value per change row, as hex strings:
    [03][00][16B schema-version UUID] + the registry-agnostic Avro
    binary body (``glue_schema_registry.go:326-353`` getMsgHeader; the
    Confluent/Glue split is only the header, ``arvo.go:1019-1032``)."""
    return encode_avro_confluent(df, exclude=exclude,
                                 key_hdr=_GLUE_KEY_HDR,
                                 value_hdr=_GLUE_VALUE_HDR)


def avro_glue_oracle_suffix(exclude: tuple[str, ...] = ()) -> str:
    """DuckDB mirror of :func:`encode_avro_glue`."""
    return avro_wire_oracle_suffix(exclude=exclude,
                                   key_hdr=_GLUE_KEY_HDR,
                                   value_hdr=_GLUE_VALUE_HDR)


# ---------------------------------------------------------------------------
# Schema-evolution framing: per-row schema id resolved from the registry
# (v1 before the evolution boundary, v2 — which appends a nullable props
# field — after it). The id literals come from FileSchemaRegistry
# registrations, so the framed bytes prove the allocator's behavior.
# ---------------------------------------------------------------------------
def avro_evolution_steps(d_name: str, key_id: int, v1_id: int, v2_id: int,
                         mid_sql: str) -> list[tuple[str, str]]:
    """Ordered (column, SQL) steps: v1 body for ``commit_ts <= mid``,
    v2 body (v1 + Avro union-string props tail) after. Expects the
    avro_wire_steps columns plus ``props``."""
    d = _dialect(d_name)
    steps = avro_wire_steps(d_name)[:3]  # et_h, op_h, value_body_h
    k_hdr = f"00{key_id:08X}"
    v1_hdr = f"00{v1_id:08X}"
    v2_hdr = f"00{v2_id:08X}"
    steps.append((
        "props_h",
        f"CASE WHEN props IS NULL THEN '00' ELSE '{_UNION1}' || "
        f"{_vhex(d['slen']('props'), d, 3)} || hex(props) END",
    ))
    steps.append((
        "schema_id",
        f"CAST(CASE WHEN commit_ts <= {mid_sql} THEN {v1_id} "
        f"ELSE {v2_id} END AS BIGINT)",
    ))
    steps.append(("key_hex", f"'{k_hdr}' || {_vhex('pk', d)}"))
    steps.append((
        "value_hex",
        f"CASE WHEN op <> 'D' THEN CASE WHEN commit_ts <= {mid_sql} "
        f"THEN '{v1_hdr}' || value_body_h "
        f"ELSE '{v2_hdr}' || value_body_h || props_h END END",
    ))
    return steps


def encode_avro_evolution(df: DataFrame, key_id: int, v1_id: int,
                          v2_id: int, mid: int) -> DataFrame:
    """Frame each change row with the registry-resolved schema id and the
    matching record body (v2 appends the union-string props field).
    Pure column expressions — whole-stage codegen, no Python."""
    steps = avro_evolution_steps("spark", key_id, v1_id, v2_id, str(int(mid)))
    out = df.selectExpr("*", *[f"{sql} AS {name}" for name, sql in steps])
    return out.drop("et_h", "op_h", "value_body_h", "props_h")


def avro_evolution_oracle_suffix(key_id: int, v1_id: int, v2_id: int,
                                 mid_sql: str) -> str:
    """DuckDB mirror: chained CTEs over ``avro_in`` ending in
    ``avro_evo``."""
    steps = avro_evolution_steps("duckdb", key_id, v1_id, v2_id, mid_sql)
    sql = []
    prev = "avro_in"
    for i, (name, expr) in enumerate(steps):
        cte = "avro_evo" if i == len(steps) - 1 else f"ave{i}"
        sql.append(f", {cte} AS (SELECT *, {expr} AS {name} FROM {prev})")
        prev = cte
    return "".join(sql)


# ---------------------------------------------------------------------------
# Consumer-side decoder (E7 for the Confluent Avro wire format) — an
# independent Python implementation of Avro binary decoding (spec §binary
# encoding) + the 5-byte Confluent header, run over Arrow mapInPandas.
# Deliberately NOT derived from the hex-generating SQL above: encoder and
# decoder meet only at the byte level.
# ---------------------------------------------------------------------------
def avro_long(b: bytes, i: int) -> tuple[int, int]:
    x, s = 0, 0
    while True:
        x |= (b[i] & 0x7F) << s
        s += 7
        i += 1
        if not b[i - 1] & 0x80:
            return (x >> 1) ^ -(x & 1), i


def avro_string(b: bytes, i: int) -> tuple[str, int]:
    n, i = avro_long(b, i)
    return b[i:i + n].decode("utf-8"), i + n


def strip_confluent_header(raw: bytes, want_id: int) -> bytes:
    if len(raw) < 5:
        raise ValueError(f"avro: payload too short for confluent header ({len(raw)}B)")
    if raw[0] != 0x00:
        raise ValueError(f"avro: bad confluent magic byte {raw[0]:#x}")
    got = int.from_bytes(raw[1:5], "big")
    if got != want_id:
        raise ValueError(f"avro: schema id {got} != expected {want_id}")
    return raw[5:]


def strip_glue_header(raw: bytes, want_uuid: uuid.UUID) -> bytes:
    """Validate and strip the 18-byte Glue message header
    (``getGlueSchemaIDFromHeader``: len >= 18, version byte 3,
    compression byte 0, schema-version UUID at bytes 2:18)."""
    if len(raw) < 18:
        raise ValueError(f"avro: payload too short for glue header ({len(raw)}B)")
    if raw[0] != GLUE_HEADER_VERSION:
        raise ValueError(f"avro: bad glue header version byte {raw[0]}")
    if raw[1] != GLUE_NO_COMPRESSION:
        raise ValueError(f"avro: unsupported glue compression byte {raw[1]}")
    got = uuid.UUID(bytes=raw[2:18])
    if got != want_uuid:
        raise ValueError(f"avro: glue schema uuid {got} != expected {want_uuid}")
    return raw[18:]


def decode_avro_key(raw: bytes) -> int:
    body = strip_confluent_header(raw, KEY_SCHEMA_ID)
    pk, i = avro_long(body, 0)
    if i != len(body):
        raise ValueError(f"avro: key has {len(body) - i} trailing bytes")
    return pk


def decode_avro_glue_key(raw: bytes) -> int:
    body = strip_glue_header(raw, GLUE_KEY_SCHEMA_UUID)
    pk, i = avro_long(body, 0)
    if i != len(body):
        raise ValueError(f"avro: glue key has {len(body) - i} trailing bytes")
    return pk


def decode_avro_glue_value(raw: bytes) -> dict:
    return _decode_value_body(strip_glue_header(raw, GLUE_VALUE_SCHEMA_UUID))


def decode_avro_value(raw: bytes) -> dict:
    return _decode_value_body(strip_confluent_header(raw, VALUE_SCHEMA_ID))


def _decode_value_body(body: bytes) -> dict:
    i = 0
    pk, i = avro_long(body, i)
    branch, i = avro_long(body, i)
    if branch != 1:
        raise ValueError(f"avro: event_type union branch {branch} != 1")
    event_type, i = avro_string(body, i)
    branch, i = avro_long(body, i)
    if branch != 1:
        raise ValueError(f"avro: value_cents union branch {branch} != 1")
    value_cents, i = avro_long(body, i)
    branch, i = avro_long(body, i)
    if branch != 1:
        raise ValueError(f"avro: user_id union branch {branch} != 1")
    user_id, i = avro_long(body, i)
    op, i = avro_string(body, i)
    commit_ts, i = avro_long(body, i)
    phys, i = avro_long(body, i)
    if i != len(body):
        raise ValueError(f"avro: value has {len(body) - i} trailing bytes")
    return dict(pk=pk, event_type=event_type, value_cents=value_cents,
                user_id=user_id, op=op, commit_ts=commit_ts, phys=phys)


_AVRO_DEC_SCHEMA = (
    "seq long, pk long, event_type string, value_cents long, user_id long, "
    "op_flag string, commit_ts long, phys_ms long, is_tombstone long"
)


def avro_decode_rows(df: DataFrame, key_col: str = "key_hex",
                     value_col: str = "value_hex",
                     registry: str = "confluent") -> DataFrame:
    """Decode registry-framed Avro binary messages back into typed rows;
    a null value is the delete tombstone (key decodes alone). Arrow
    ``mapInPandas``, per-partition, no shuffle. ``registry`` picks the
    header parser: ``confluent`` (5-byte magic+id) or ``glue`` (18-byte
    version+compression+UUID)."""
    import pandas as pd

    if registry not in ("confluent", "glue"):
        raise ValueError(f"unknown avro registry framing: {registry!r}")
    dec_key = decode_avro_glue_key if registry == "glue" else decode_avro_key
    dec_val = (decode_avro_glue_value if registry == "glue"
               else decode_avro_value)

    def fn(it):
        for pdf in it:
            rows = []
            for seq, kh, vh in zip(pdf["seq"], pdf[key_col], pdf[value_col]):
                pk = dec_key(bytes.fromhex(kh))
                if vh is None or (isinstance(vh, float)):
                    rows.append((int(seq), pk, None, None, None,
                                 None, None, None, 1))
                    continue
                v = dec_val(bytes.fromhex(vh))
                if v["pk"] != pk:
                    raise ValueError(
                        f"avro: key pk {pk} != value pk {v['pk']}")
                rows.append((int(seq), pk, v["event_type"], v["value_cents"],
                             v["user_id"], v["op"], v["commit_ts"],
                             v["phys"], 0))
            yield pd.DataFrame(
                rows, columns=[
                    "seq", "pk", "event_type", "value_cents", "user_id",
                    "op_flag", "commit_ts", "phys_ms", "is_tombstone",
                ],
            )

    return df.mapInPandas(fn, _AVRO_DEC_SCHEMA)
