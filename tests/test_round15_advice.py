"""Pins for the round-15 ADVICE findings.

1. ``only_updated_old_image`` must survive adversarial-but-valid JSON:
   a value containing the byte sequence ``,"`` (e.g. ``a,"b`` rendered
   as ``"a,\\"b"``) or a trailing comma inside a string must not split a
   fragment — the boundary regex requires a complete JSON string key
   plus colon after the comma.
2. ``column_selected([])`` matches nothing (the reference's
   ParseColumnFilter folds over a false start), and
3. ``ColumnSelector(columns=[])`` is rejected at construction.
"""

import json

import pytest

from tigate_spark.config import ColumnSelector
from tigate_spark.operators.projections import (
    column_selected,
    only_updated_old_image,
)


def _diff(spark, before: str, after: str) -> str:
    df = spark.createDataFrame([(before, after)], "before string, after string")
    return df.select(
        only_updated_old_image(df.before, df.after).alias("old")
    ).first()["old"]


def test_old_image_value_with_comma_quote(spark):
    # value 'a,"b' JSON-renders with an escaped quote; the ," bytes sit
    # INSIDE the string and must not open a fragment boundary
    before = '{"pk":1,"event_type":"a,\\"b","value_cents":100}'
    after = '{"pk":1,"event_type":"a,\\"b","value_cents":200}'
    assert _diff(spark, before, after) == '{"value_cents":100}'
    # sanity: the before image is valid JSON and the value round-trips
    assert json.loads(before)["event_type"] == 'a,"b'


def test_old_image_changed_fragment_kept_verbatim(spark):
    # when the adversarial value itself changed, its ORIGINAL fragment
    # (escapes and all) is kept byte-verbatim
    before = '{"pk":1,"event_type":"a,\\"b","value_cents":5}'
    after = '{"pk":1,"event_type":"x","value_cents":5}'
    assert _diff(spark, before, after) == '{"event_type":"a,\\"b"}'


def test_old_image_trailing_comma_in_value(spark):
    # value ending in ',' puts the bytes ," at the closing quote; the
    # lookahead rejects it (no colon after the would-be key string)
    before = '{"pk":1,"event_type":"a,","value_cents":1,"user_id":2}'
    after = '{"pk":1,"event_type":"a,","value_cents":9,"user_id":2}'
    assert _diff(spark, before, after) == '{"value_cents":1}'


def test_old_image_value_resembling_kv_pair(spark):
    # a value containing an ESCAPED '","k":' shape cannot fool the
    # boundary: the char after the inner comma is a backslash, not a
    # quote, so the lookahead fails
    before = '{"pk":1,"event_type":"x\\",\\"fake\\":1","value_cents":3}'
    assert json.loads(before)["event_type"] == 'x","fake":1'
    after = '{"pk":1,"event_type":"x\\",\\"fake\\":1","value_cents":7}'
    assert _diff(spark, before, after) == '{"value_cents":3}'


def test_column_selected_empty_rules_match_nothing():
    assert column_selected("anything", []) is False
    assert column_selected("anything", ["*"]) is True


def test_column_selector_rejects_empty_rule_list():
    with pytest.raises(ValueError, match="at least one rule"):
        ColumnSelector(matcher=["*.*"], columns=[])
    # the default stays select-everything
    assert ColumnSelector().columns == ["*"]
