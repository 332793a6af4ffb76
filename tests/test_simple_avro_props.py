"""Property tests for the simple-Avro wire primitives: the dual-dialect
SQL varint/string generators (evaluated in DuckDB, no Spark needed)
must produce bytes the independent Python Avro reader decodes back to
the original value — across the full value domain, including the
negative zigzag branch and multi-byte ladder boundaries."""

from __future__ import annotations

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from tigate_spark.functions.craft import _dialect
import pytest

from tigate_spark.functions.simple_avro import (
    _py_str,
    _py_vz,
    _strhex,
    _vz,
    avro_read,
)

_D = _dialect("duckdb")


def _eval(sql: str) -> str:
    return duckdb.sql(f"SELECT {sql} AS h").fetchone()[0]


def _vz_lit(v: int) -> str:
    # bare literals type as INT32 in DuckDB and overflow the zigzag
    # doubling; oracle columns are BIGINT, so match that here
    return _vz(f"CAST({v} AS BIGINT)", _D)


@given(st.integers(min_value=-(2**63), max_value=2**63 - 1))
@settings(max_examples=200, deadline=None)
@pytest.mark.slow
def test_sql_varint_roundtrips_through_reader(v):
    hx = _eval(_vz_lit(v))
    got, used = avro_read("long", bytes.fromhex(hx))
    assert got == v
    assert used * 2 == len(hx)  # canonical minimal encoding, no tail


@pytest.mark.slow
@given(st.integers(min_value=0, max_value=2**63 - 1))
@settings(max_examples=100, deadline=None)
def test_sql_varint_matches_python_literal(v):
    """The SQL ladder and the Python literal helper are two independent
    renderings of the same encoding — they must agree byte-for-byte."""
    assert _eval(_vz_lit(v)) == _py_vz(v)


@pytest.mark.slow
@given(st.integers(min_value=1, max_value=2**63 - 1))
@settings(max_examples=50, deadline=None)
def test_ladder_boundaries(v):
    """Exact powers of 128 sit on CASE-ladder boundaries — check v-1,
    v, v+1 around each boundary at or below the sampled value."""
    b = 1
    while b * 128 <= v:
        b *= 128
    for x in (b - 1, b, b + 1):
        got, _ = avro_read("long", bytes.fromhex(_eval(_vz_lit(x))))
        assert got == x


@given(st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FF),
    max_size=40))
@settings(max_examples=100, deadline=None)
def test_sql_string_roundtrips_multibyte(s):
    """Avro strings are length-prefixed in BYTES (not chars): the SQL
    form must agree with the Python literal and decode back exactly,
    including multi-byte UTF-8 (Latin-1/IPA block)."""
    if "'" in s:
        s = s.replace("'", "")
    hx = _eval(_strhex(f"'{s}'", _D))
    assert hx == _py_str(s)
    got, used = avro_read("string", bytes.fromhex(hx))
    assert got == s and used * 2 == len(hx)


def test_vz_is_the_craft_generator():
    """r12 VERDICT #5: one zigzag-varint generator. simple_avro._vz must
    delegate to craft._vhex — identical SQL for identical inputs."""
    from tigate_spark.functions.craft import _vhex
    for d_name in ("spark", "duckdb"):
        d = _dialect(d_name)
        assert _vz("x", d) == _vhex("x", d)
        assert (_vz("x", d, 5, type_bounded=True)
                == _vhex("x", d, 5, type_bounded=True))


@pytest.mark.slow
@given(st.integers(min_value=-(2**63), max_value=2**63 - 1))
@settings(max_examples=200, deadline=None)
def test_craft_vhex_full_domain(v):
    """The unified generator under the craft name: full-int64 round trip
    through the independent Avro reader (zigzag wire is shared), with
    canonical minimal length."""
    from tigate_spark.functions.craft import _vhex
    hx = _eval(_vhex(f"CAST({v} AS BIGINT)", _D))
    got, used = avro_read("long", bytes.fromhex(hx))
    assert got == v
    assert used * 2 == len(hx)


@given(st.integers(min_value=-(2**63), max_value=2**63 - 1))
@settings(max_examples=100, deadline=None)
def test_craft_vhex_narrow_hint_is_ignored_unless_bounded(v):
    """A narrow nbytes WITHOUT type_bounded must be widened to the full
    ladder — the silent-truncation envelope cannot be re-introduced by
    a careless call site."""
    from tigate_spark.functions.craft import _vhex
    hx = _eval(_vhex(f"CAST({v} AS BIGINT)", _D, 2))
    got, _ = avro_read("long", bytes.fromhex(hx))
    assert got == v
