"""Regression pin for the r17 packed-varint-hex optimization: the Spark
dialect's packed-bigint CASE bodies (_packed_hex) must stay byte-equal
to the per-byte lpad(hex(byte)) spelling the DuckDB oracle keeps, over
the full signed-64 / unsigned-63 domains' adversarial boundaries."""

from __future__ import annotations

from tigate_spark.functions.craft import _dialect, _uvhex, _vhex


def _boundary_longs() -> list[int]:
    vals = set()
    for k in range(64):
        for delta in (-2, -1, 0, 1, 2):
            for sign in (1, -1):
                v = sign * ((1 << k) + delta)
                if -(1 << 63) <= v < (1 << 63):
                    vals.add(v)
    vals.update({0, 1, -1, (1 << 63) - 1, -(1 << 63), 63, 64, -64, -65,
                 8191, 8192, 127, 128})
    return sorted(vals)


def _py_base128(u: int) -> str:
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            break
    return out.hex().upper()


def test_packed_hex_equals_per_byte_and_reference(spark):
    d_packed = _dialect("spark")
    assert d_packed.get("packed_hex"), "spark dialect lost the packed form"
    d_perbyte = {k: v for k, v in d_packed.items() if k != "packed_hex"}

    vals = _boundary_longs()
    df = spark.createDataFrame([(v,) for v in vals], "v bigint")
    rows = df.selectExpr(
        "v",
        f"{_vhex('v', d_packed)} AS zz_p",
        f"{_vhex('v', d_perbyte)} AS zz_b",
        f"CASE WHEN v >= 0 THEN {_uvhex('v', d_packed)} END AS uv_p",
        f"CASE WHEN v >= 0 THEN {_uvhex('v', d_perbyte)} END AS uv_b",
    ).collect()
    assert len(rows) == len(vals)
    for r in rows:
        v = r["v"]
        zz_ref = _py_base128(2 * v if v >= 0 else -2 * v - 1)
        assert r["zz_p"] == r["zz_b"] == zz_ref, f"zigzag diverged at {v}"
        if v >= 0:
            assert r["uv_p"] == r["uv_b"] == _py_base128(v), \
                f"uvarint diverged at {v}"


def test_type_bounded_short_ladders_match(spark):
    # the shrunken ladders (string byte lengths etc.) must keep the same
    # in-domain bytes in both spellings
    d_packed = _dialect("spark")
    d_perbyte = {k: v for k, v in d_packed.items() if k != "packed_hex"}
    vals = [0, 1, 63, 64, 127, 128, 8191, 8192, (1 << 31) - 1, 1 << 31,
            (1 << 34) - 1]
    df = spark.createDataFrame([(v,) for v in vals], "v bigint")
    rows = df.selectExpr(
        "v",
        f"{_vhex('v', d_packed, 5, type_bounded=True)} AS zz_p",
        f"{_vhex('v', d_perbyte, 5, type_bounded=True)} AS zz_b",
        f"{_uvhex('v', d_packed, 3, type_bounded=True)} AS uv_p",
        f"{_uvhex('v', d_perbyte, 3, type_bounded=True)} AS uv_b",
    ).collect()
    for r in rows:
        assert r["zz_p"] == r["zz_b"], f"bounded zigzag diverged at {r['v']}"
        assert r["uv_p"] == r["uv_b"], f"bounded uvarint diverged at {r['v']}"
