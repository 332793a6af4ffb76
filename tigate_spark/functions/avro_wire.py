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
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from tigate_spark.functions.craft import _dialect, _vhex

#: magic byte 0x00 + 4-byte BE schema id (confluent_schema_registry.go:400-408)
KEY_SCHEMA_ID = 1
VALUE_SCHEMA_ID = 2
_KEY_HDR = f"00{KEY_SCHEMA_ID:08X}"
_VALUE_HDR = f"00{VALUE_SCHEMA_ID:08X}"
#: union branch index 1 (non-null) as a zigzag-varint long
_UNION1 = "02"


def avro_wire_steps(d_name: str) -> list[tuple[str, str]]:
    """Ordered (column, SQL) steps shared by the Spark builder and the
    DuckDB oracle. Expects columns: op, pk, event_type, value_cents,
    user_id, commit_ts."""
    d = _dialect(d_name)
    steps: list[tuple[str, str]] = []
    # Avro string = long(byte length) + bytes
    steps.append((
        "et_h",
        f"{_vhex(d['slen']('event_type'), d, 3)} || hex(event_type)",
    ))
    op_ch = "CASE WHEN op = 'I' THEN 'c' ELSE 'u' END"
    steps.append(("op_h", f"'02' || hex({op_ch})"))
    steps.append((
        "value_body_h",
        f"{_vhex('pk', d)} || '{_UNION1}' || et_h || "
        f"'{_UNION1}' || {_vhex('value_cents', d)} || "
        f"'{_UNION1}' || {_vhex('user_id', d)} || op_h || "
        f"{_vhex('commit_ts', d)} || {_vhex(d['idiv']('commit_ts', 1000), d)}",
    ))
    steps.append((
        "key_hex",
        f"'{_KEY_HDR}' || {_vhex('pk', d)}",
    ))
    steps.append((
        "value_hex",
        f"CASE WHEN op <> 'D' THEN '{_VALUE_HDR}' || value_body_h END",
    ))
    return steps


def encode_avro_confluent(df: DataFrame) -> DataFrame:
    """Confluent-framed Avro binary key/value per change row, as hex
    strings (``unhex`` of the columns is the exact producer payload).

    Expects ``op, pk, event_type, value_cents, user_id, commit_ts``.
    Pure column expressions — whole-stage codegen, no Python on the path.
    """
    steps = avro_wire_steps("spark")
    out = df.selectExpr("*", *[f"{sql} AS {name}" for name, sql in steps])
    return out.drop("et_h", "op_h", "value_body_h")


def avro_wire_oracle_suffix() -> str:
    """DuckDB mirror: chained CTEs over an ``avro_in`` relation ending in
    ``avro_msg`` with key_hex/value_hex."""
    steps = avro_wire_steps("duckdb")
    sql = []
    prev = "avro_in"
    for i, (name, expr) in enumerate(steps):
        cte = "avro_msg" if i == len(steps) - 1 else f"av{i}"
        sql.append(f", {cte} AS (SELECT *, {expr} AS {name} FROM {prev})")
        prev = cte
    return "".join(sql)
