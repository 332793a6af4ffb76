"""Portable deterministic hashing (Spark ⇄ DuckDB identical).

Spark's ``hash``/``xxhash64`` and DuckDB's ``hash`` use different
algorithms, so anything hash-partitioned or hash-bucketed could never be
oracle-checked. Instead we derive integers from md5 hex digests — md5 is
byte-identical in both engines:

- ``h32(x)``  = first 8 hex chars of md5 → unsigned 32-bit int.
- ``h60(x)``  = first 15 hex chars of md5 → 60-bit non-negative int
  (fits comfortably in a signed 64-bit value in both engines).

Reference parity: tigate's routing hashes (event router partition
generators, ``downstreamadapter/sink/helper/eventrouter/partition/*.go``)
only need *stable* uniform hashing — the exact function is an
implementation detail, so a portable md5-derived hash preserves semantics.

In the hot path at 100 TB scale these stay JVM-side (built-in ``md5`` /
``conv`` / ``substring`` — whole-stage codegen, no Python).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column
from pyspark.sql import functions as F


def h32_py(s: str) -> int:
    """Driver-side twin of :func:`h32` — same value for the same string.

    Used to pre-compute hash-family constants (MinHash a_i/b_i, LSH plane
    coefficients) at plan-build time instead of per row per element.
    """
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def h32(col: Column) -> Column:
    """Unsigned 32-bit int from md5 of the column's string form (Spark)."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10).cast("bigint")


def h32_sql(expr: str) -> str:
    """DuckDB rendering of :func:`h32` for the same input expression."""
    return f"CAST(('0x' || substr(md5(CAST(({expr}) AS VARCHAR)), 1, 8)) AS BIGINT)"


def h60(col: Column) -> Column:
    """60-bit non-negative int from md5 (Spark)."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast("bigint")


def h60_sql(expr: str) -> str:
    return f"CAST(('0x' || substr(md5(CAST(({expr}) AS VARCHAR)), 1, 15)) AS BIGINT)"
