"""Cheap exact replacement for ``F.round(x).cast('bigint')`` on
non-negative doubles — the integer-cents rendering used throughout the
relational catalog and the change-stream normalization.

Spark's ``Round`` on DoubleType allocates a ``java.math.BigDecimal`` per
value (``BigDecimal.valueOf(x).setScale(0, HALF_UP)`` — a Double.toString
parse plus object allocations in the innermost loop). For the money
columns here that is the single most expensive expression in the TPC-H
pipelines: r17 measurement put Q1's four per-row rounds at ~0.23 s of its
0.44 s wall (plans/r17/, OPTIMIZATION_r17.md).

The replacement computes the identical integer entirely in double
arithmetic::

    CASE WHEN x < 0.5 THEN 0 ELSE floor(x + 0.5) END

Exactness argument (for 0 <= x, x + 1 < 2**52):

- ``BigDecimal.valueOf`` rounds the shortest decimal string of x, and
  that string is on the same side of every exactly-representable
  ``m + 0.5`` boundary as x's binary value (shortest-round-trip strings
  preserve ordering against representable boundaries), so Spark's Round
  is plain round-half-up on the binary value.
- For ``x >= 0.5``: the only hazard in ``floor(x + 0.5)`` is the FP
  addition rounding ``x + 0.5`` up to ``m + 1`` for some ``x < m + 0.5``.
  The nearest double below ``m + 0.5`` is at distance one ulp ``s`` of
  the binade containing ``m + 0.5``; since ``m >= 1``, ``m + 0.5`` is
  never a power of two, so ``m + 1``'s lower neighbourhood has spacing
  >= ``s`` and the true sum ``m + 1 - eps`` (``eps >= s``) rounds to a
  representable value strictly below ``m + 1``. No divergence.
- For ``x < 0.5`` the guard returns 0 directly. This branch exists
  because ``x = 0.49999999999999994`` (the unique double just below 0.5,
  where the binade boundary halves the ulp) has ``x + 0.5`` round to
  exactly 1.0 under ties-to-even — the one point where the bare floor
  form diverges on the whole non-negative domain.

Verified row-exact against ``F.round`` over every affected expression at
sf0.001/0.01/0.1 (zero mismatches, zero negative inputs) and
property-tested (hypothesis + adversarial boundary set) in
tests/test_rounding_equivalence.py.

Do NOT use the bare non-negative form for possibly-negative columns
(e.g. cosine scores, account balances): HALF_UP rounds away from zero
there while floor rounds toward +inf. Use the sign-aware twins instead —
:func:`round_half_away_bigint` (column form, r18) or
:func:`round_half_away_sql` (SQL-string form) — which are exact on the
FULL signed domain for one extra branch-predictable CASE; never fall
back to the BigDecimal-allocating ``F.round`` on a hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def round_half_up_bigint(col: Column) -> Column:
    """Exact twin of ``F.round(col).cast('bigint')`` for non-negative
    doubles with ``col + 1 < 2**52`` — see module docstring."""
    return (
        F.when(col < 0.5, F.lit(0).cast("bigint"))
        .otherwise(F.floor(col + F.lit(0.5)))
        .cast("bigint")
    )


def cents(col: Column) -> Column:
    """Integer cents: ``round(col * 100)`` as bigint (non-negative input)."""
    return round_half_up_bigint(col * 100)


def round_half_away_bigint(col: Column) -> Column:
    """Column twin of :func:`round_half_away_sql` — exact
    ``F.round(col).cast('bigint')`` for ANY double with
    ``|col| + 1 < 2**52``, sign-aware (HALF_UP = away from zero).

    r18 (VERDICT #4): use this wherever the input domain is not *proven*
    non-negative — ``round_half_up_bigint`` silently returns 0 for
    negative inputs. The extra CASE is branch-predictable on one-sided
    data and measured free in the bench."""
    a = F.abs(col)
    mag = (
        F.when(a < 0.5, F.lit(0).cast("bigint"))
        .otherwise(F.floor(a + F.lit(0.5)))
        .cast("bigint")
    )
    return F.when(col < 0, -mag).otherwise(mag).cast("bigint")


def round_half_away_sql(v: str) -> str:
    """SQL-expression twin of ``cast(round(v) as bigint)`` for ANY double
    with ``|v| + 1 < 2**52`` — sign-aware: Spark's Round (BigDecimal
    HALF_UP) rounds away from zero, which mirrors the guarded floor form
    through ``-round(|v|)``. ``v`` is substituted verbatim (parenthesize
    composite expressions at the call site or pass a column name)."""
    pos = f"case when ({v}) < 0.5d then 0L else floor(({v}) + 0.5d) end"
    neg = f"case when -({v}) < 0.5d then 0L else floor(-({v}) + 0.5d) end"
    return (
        f"cast(case when ({v}) >= 0 then ({pos}) else -({neg}) end as bigint)"
    )
