"""Round-14 regression tests for the advisor's findings: the
column-selector table matcher must be start-anchored (fnmatch.translate
only appends \\Z and Spark ``rlike`` is substring matching, so an
unanchored 'app.t1' also matched 'webapp.t1'), and the changefeed must
apply ``column_selectors`` with first-matching-rule dispatch
(``columnselector/column_selector.go:74-101`` ColumnSelectors.GetSelector)
rather than cumulatively intersecting every rule."""

from __future__ import annotations

from tigate_spark.config import ColumnSelector


def _mk(spark, rows):
    return spark.createDataFrame(
        rows, "schema_name string, table_name string, table_id long, "
              "commit_ts long, pk long, event_type string, "
              "value_cents long")


# -- matcher anchoring (superstring schema must NOT match) -------------------

def test_table_matcher_anchored_superstring_schema(spark):
    from tigate_spark.operators.projections import column_selectors

    rows = [("app", "t1", 1, 1, 1, "click", 100),
            ("webapp", "t1", 1, 1, 2, "view", 200)]
    df = _mk(spark, rows)
    rules = [ColumnSelector(matcher=["app.t1"], columns=["event_type"])]
    out = {r["schema_name"]: r for r in column_selectors(df, rules).collect()}
    # app.t1 matches the rule: value_cents deselected → NULL
    assert out["app"]["event_type"] == "click"
    assert out["app"]["value_cents"] is None
    # webapp.t1 is a SUPERSTRING of the matcher — must fall through to
    # the DefaultColumnSelector and keep every column
    assert out["webapp"]["event_type"] == "view"
    assert out["webapp"]["value_cents"] == 200


def test_table_matcher_anchored_superstring_table(spark):
    from tigate_spark.operators.projections import column_selectors

    rows = [("app", "t1", 1, 1, 1, "click", 100),
            ("app", "xt1", 1, 1, 2, "view", 200)]
    df = _mk(spark, rows)
    rules = [ColumnSelector(matcher=["app.t1"], columns=["event_type"])]
    out = {r["table_name"]: r for r in column_selectors(df, rules).collect()}
    assert out["t1"]["value_cents"] is None
    # 'app.xt1' ends with 'app.t1'? no — but 'xt1' CONTAINS 't1'; the
    # \Z end-anchor alone can't catch a prefix superstring either way,
    # so pin both directions: unmatched table keeps its columns
    assert out["xt1"]["value_cents"] == 200


# -- changefeed applies first-match dispatch, not cumulative rules -----------

def test_changefeed_column_selectors_first_match(spark, tmp_path):
    """Two overlapping rules through the BATCH path of the changefeed's
    _build_stream transform chain: under the old cumulative loop the
    second rule would ALSO null t0's event_type (intersection); under
    GetSelector dispatch the first matching rule alone decides."""
    from tigate_spark.config import ChangefeedConfig, SinkConfig
    from tigate_spark.streaming.changefeed import Changefeed

    from tigate_spark.sources.batch import load_table

    sf_dir = "/root/testdata/sf0.001"
    cfg = ChangefeedConfig(
        changefeed_id="cs-dispatch",
        sink_uri="blackhole://",
        sink=SinkConfig(column_selectors=[
            ColumnSelector(matcher=["app.t0"], columns=["event_type"]),
            ColumnSelector(matcher=["app.t*"], columns=["value_cents"]),
        ]),
    )
    feed = Changefeed(spark, cfg, sf_dir, str(tmp_path))
    ch = feed.transform(load_table(spark, sf_dir, "events"))
    t0 = ch.filter("table_name = 't0'").limit(5).collect()
    t1 = ch.filter("table_name = 't1'").limit(5).collect()
    assert t0 and all(r["event_type"] is not None for r in t0)
    assert all(r["value_cents"] is None for r in t0)
    assert t1 and all(r["event_type"] is None for r in t1)
    assert all(r["value_cents"] is not None for r in t1)


# -- table-filter column DSL (ParseColumnFilter semantics) -------------------

def test_column_filter_negation_last_match_wins():
    from tigate_spark.operators.projections import column_selected

    # the scenario's exact rule: everything except b
    assert column_selected("a", ["*", "!b"])
    assert not column_selected("b", ["*", "!b"])
    # last match wins: re-include after a negation
    assert column_selected("event_type", ["*", "!e*", "event_type"])
    assert not column_selected("evil", ["*", "!e*", "event_type"])
    # leading negation implies accept-all first
    assert not column_selected("abc", ["!a*"])
    assert column_selected("xyz", ["!a*"])
    # case-insensitive (SinkConfig.CaseSensitive defaults false)
    assert not column_selected("B", ["*", "!b"])
    # positive-only rule sets keep the historical any-match behavior
    assert column_selected("event_type", ["event_*"])
    assert not column_selected("value_cents", ["event_*"])
    # empty rule list matches NOTHING (r15 ADVICE: mirror
    # ParseColumnFilter's false fold start; ColumnSelector rejects []
    # at construction so this branch is direct-caller-only)
    assert not column_selected("anything", [])


def test_column_selectors_dispatch_with_negation(spark):
    from tigate_spark.config import ColumnSelector
    from tigate_spark.operators.projections import column_selectors

    rows = [("app", "t0", 0, 1, 1, "click", 100, 5)]
    df = spark.createDataFrame(
        rows, "schema_name string, table_name string, table_id long, "
              "commit_ts long, pk long, event_type string, "
              "value_cents long, user_id long")
    rules = [ColumnSelector(matcher=["app.*"],
                            columns=["*", "!user_id"])]
    r = column_selectors(df, rules).collect()[0]
    assert r["event_type"] == "click" and r["value_cents"] == 100
    assert r["user_id"] is None
    assert r["pk"] == 1  # handle key survives
