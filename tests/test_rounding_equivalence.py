"""round_half_up_bigint must be an exact drop-in for
``F.round(x).cast('bigint')`` on its contract domain (x >= 0, x < 2**51).

The r17 optimization replaced Spark's BigDecimal-allocating ``Round`` with
``floor(x + 0.5)`` in every integer-cents projection (catalog_relational,
sources/changes). A divergence here silently changes money sums, so the
equivalence is pinned three ways: hypothesis over the contract domain,
the documented adversarial boundary values, and the real money
expressions over the sf0.001 data.
"""

from __future__ import annotations

import math

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

def _bigdecimal_half_up(x: float) -> int:
    """Python twin of Spark's Round on double: HALF_UP on the shortest
    decimal string (repr(float) is shortest-round-trip, like
    Double.toString)."""
    from decimal import ROUND_HALF_UP, Decimal

    return int(Decimal(repr(x)).quantize(Decimal(1), rounding=ROUND_HALF_UP))


def _floor_half(x: float) -> int:
    # twin of round_half_up_bigint's guarded floor form
    return 0 if x < 0.5 else math.floor(x + 0.5)


@given(st.floats(min_value=0.0, max_value=float(2**51), allow_nan=False))
@settings(max_examples=2000, deadline=None)
def test_floor_form_matches_half_up_on_contract_domain(x: float) -> None:
    assert _floor_half(x) == _bigdecimal_half_up(x), x


def test_adversarial_boundaries() -> None:
    cases = [
        0.0, 0.5, 0.49999999999999994, 1.5, 2.5,
        14.499999999999998, 14.999999999999998,
        math.nextafter(0.5, 0.0), math.nextafter(0.5, 1.0),
        math.nextafter(1000.5, 0.0), math.nextafter(1000.5, 2000.0),
        math.nextafter(10_000_000.5, 0.0),
        math.nextafter(10_000_000.5, 1e9),
        float(2**51 - 1), 2**51 - 1.5,
    ]
    for x in cases:
        assert _floor_half(x) == _bigdecimal_half_up(x), x


@pytest.mark.slow
def test_spark_expressions_identical_on_testdata(spark) -> None:
    """Every replaced money expression, row-exact vs F.round at sf0.001."""
    from pyspark.sql import functions as F
    exprs = {
        "lineitem": [
            "l_quantity",
            "l_extendedprice * 100",
            "l_extendedprice * (1 - l_discount) * 100",
            "l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100",
            "l_extendedprice * l_discount * 100",
        ],
        "orders": ["o_totalprice * 100"],
        "events": ["value * 100"],
    }
    for tbl, es in exprs.items():
        df = spark.read.parquet(f"/root/testdata/sf0.001/{tbl}.parquet")
        for e in es:
            n_neg = df.filter(F.expr(f"({e}) < 0")).count()
            assert n_neg == 0, f"{tbl}: {e} has negative values"
            n_bad = df.filter(
                F.expr(
                    f"cast(round({e}) as bigint) != cast(case when ({e}) < 0.5d "
                    f"then 0 else floor(({e}) + 0.5d) end as bigint)"
                )
            ).count()
            assert n_bad == 0, f"{tbl}: {e} diverges on {n_bad} rows"


# --- r18: sign-aware column form (round_half_away_bigint) ------------------

def _half_away(x: float) -> int:
    # twin of round_half_away_bigint (sign-mirrored guarded floor)
    m = 0 if abs(x) < 0.5 else math.floor(abs(x) + 0.5)
    return -m if x < 0 else m


@given(st.floats(min_value=-float(2**51), max_value=float(2**51),
                 allow_nan=False))
@settings(max_examples=2000, deadline=None)
def test_half_away_matches_half_up_on_full_domain(x: float) -> None:
    assert _half_away(x) == _bigdecimal_half_up(x), x


def test_half_away_adversarial_boundaries() -> None:
    cases = [
        0.0, -0.0, 0.5, -0.5, 0.49999999999999994, -0.49999999999999994,
        -1.5, -2.5, -14.499999999999998,
        math.nextafter(-0.5, 0.0), math.nextafter(-0.5, -1.0),
        math.nextafter(-1000.5, 0.0), math.nextafter(-1000.5, -2000.0),
        -float(2**51 - 1), -(2**51 - 1.5),
    ]
    for x in cases:
        assert _half_away(x) == _bigdecimal_half_up(x), x


@pytest.mark.slow
def test_spark_half_away_identical_on_negative_domains(spark) -> None:
    """The r18 sign-aware sites (acctbal — genuinely negative in the
    data — and the event value) must match F.round row-exact."""
    from pyspark.sql import functions as F

    from tigate_spark.functions.rounding import round_half_away_bigint

    for tbl, e in [("customer", "c_acctbal"), ("supplier", "s_acctbal"),
                   ("events", "value")]:
        df = spark.read.parquet(f"/root/testdata/sf0.001/{tbl}.parquet")
        n_bad = df.withColumn(
            "a", F.round(F.col(e) * 100).cast("bigint")
        ).withColumn(
            "b", round_half_away_bigint(F.col(e) * 100)
        ).filter("a != b or (a is null) != (b is null)").count()
        assert n_bad == 0, f"{tbl}.{e} diverges on {n_bad} rows"
