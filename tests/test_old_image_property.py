"""Property test for ``only_updated_old_image`` (P2 old-image diff):
for ANY valid flat JSON object — values containing quotes, backslashes,
commas, colons, newlines, unicode — the diff must keep exactly the
changed keys' ORIGINAL fragments, byte-verbatim, in before-image order.

This is the adversarial generalization of the r15 ADVICE finding (the
old ``,(?=")`` boundary corrupted values containing ``,\"``); the
boundary is now lexer-grade: a top-level comma followed by a complete
JSON string key and a colon. Keys stay simple identifiers — the
documented call-site invariant (column names)."""

from __future__ import annotations

import json

import pytest
from hypothesis import HealthCheck, example, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

#: 30 Spark jobs ≈ 40 s — heavyweight hypothesis model, slow set
pytestmark = pytest.mark.slow

_KEY = st.from_regex(r"[a-z_][a-z0-9_]{0,8}", fullmatch=True)
_VAL = st.one_of(
    st.none(),
    st.integers(min_value=-10**15, max_value=10**15),
    st.text(max_size=24),
)


@st.composite
def _image_pair(draw):
    keys = draw(st.lists(_KEY, min_size=1, max_size=6, unique=True))
    before = {k: draw(_VAL) for k in keys}
    after = {}
    for k in keys:
        if draw(st.booleans()):
            after[k] = before[k]
        else:
            after[k] = draw(_VAL)
    return before, after


def _expected_old(before: dict, after: dict) -> str:
    kept = {k: v for k, v in before.items() if after.get(k, object()) != v}
    # the diff keeps ORIGINAL fragments in before order; json.dumps of
    # the subset with the same separators reproduces them byte-exactly
    return json.dumps(kept, separators=(",", ":"), ensure_ascii=False)


@settings(max_examples=30, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(pair=_image_pair())
# r17 hypothesis find, pinned forever: number 0 -> string "0" is a
# CHANGED value, but the old map<string,string> comparison cast both
# to '0' and dropped the key — the diff now compares rendered
# fragments, never casts
@example(pair=({"a": 0}, {"a": "0"}))
def test_old_image_diff_matches_python_oracle(spark, pair):
    from tigate_spark.operators.projections import only_updated_old_image

    before, after = pair
    b = json.dumps(before, separators=(",", ":"), ensure_ascii=False)
    a = json.dumps(after, separators=(",", ":"), ensure_ascii=False)
    got = spark.createDataFrame(
        [(b, a)], "before string, after string"
    ).select(
        only_updated_old_image(F.col("before"), F.col("after")).alias("old")
    ).first()["old"]
    assert got == _expected_old(before, after), (b, a)


def test_updated_columns_type_change_and_null_before(spark):
    """updated_columns_projection must share the fragment-comparison
    semantics: a number→string change of the same rendering IS a
    change, and a null-valued before key that differs in after is
    reported (the old map_filter form dropped both)."""
    from tigate_spark.operators.projections import updated_columns_projection

    df = spark.createDataFrame(
        [("U", '{"a":0,"b":null,"c":"x"}', '{"a":"0","b":5,"c":"x"}')],
        "op string, before string, after string")
    row = updated_columns_projection(df).first()
    assert row["changed_cols"] == ["a", "b"] and row["n_changed"] == 2
