"""Library-hygiene regressions from the r04 advice: JSON escaping of raw
interpolated strings, integer batch_seq arithmetic, one shared F1 matcher,
and bounded posting-list caches."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F


def test_simple_ddl_escapes_hostile_query(spark):
    """A DDL statement containing quotes/backslashes/newlines must still
    produce valid JSON (encoders.py json_escape; r04 advice)."""
    from tigate_spark.functions.encoders import encode_simple_ddl

    hostile = 'CREATE TABLE "quoted" (c INT DEFAULT \'a\\b\')\n-- tab\there'
    df = spark.createDataFrame(
        [Row(table_id=1, commit_ts=1000, seq=1,
             ddl_type="create table", query=hostile)]
    )
    msg = encode_simple_ddl(df).select("message").first()[0]
    parsed = json.loads(msg)  # raises if the quote broke the framing
    assert parsed["sql"] == hostile
    assert parsed["type"] == "CREATE"


def test_bootstrap_escapes_hostile_names(spark):
    from tigate_spark.functions.encoders import encode_simple_bootstrap

    df = spark.createDataFrame(
        [Row(schema_name='we"ird', table_name="t\\1", table_id=7,
             commit_ts=5000, op="I", seq=1)]
    )
    msg = encode_simple_bootstrap(df).select("message").first()[0]
    parsed = json.loads(msg)
    assert parsed["database"] == 'we"ird'
    assert parsed["tableSchema"]["table"] == "t\\1"


def test_batch_seq_integer_arithmetic(spark):
    """batch_seq must be exact integer division of the 0-based row number,
    with no double round-trip in the plan."""
    from tigate_spark.functions.encoders import _with_batch_seq

    rows = [Row(topic="t", partition=0, seq=i) for i in range(10)]
    df = _with_batch_seq(spark.createDataFrame(rows), max_batch_size=3)
    got = {r["seq"]: r["batch_seq"] for r in df.collect()}
    assert got == {i: i // 3 for i in range(10)}
    assert "cast" not in df.schema["batch_seq"].dataType.simpleString()
    assert df.schema["batch_seq"].dataType.simpleString() == "bigint"


def test_table_rule_match_shares_plan_matcher(spark):
    """Driver-side verify_table and the plan-side rlike filter must agree —
    one rule_to_regex matcher for both (filters.py; r04 advice)."""
    from tigate_spark.operators.filters import table_filter, table_rule_match

    rules = ["app.orders_*", "Audit.*"]
    cases = [
        ("app", "orders_2024"), ("app", "ORDERS_2024"),
        ("Audit", "x"), ("audit", "x"), ("app", "users"),
    ]
    df = spark.createDataFrame(
        [Row(schema_name=s, table_name=t) for s, t in cases]
    )
    plan_kept = {
        (r["schema_name"], r["table_name"])
        for r in table_filter(df, rules).collect()
    }
    for s, t in cases:
        assert table_rule_match(rules, s, t) == ((s, t) in plan_kept), (s, t)
    # case-sensitivity pinned: glob matching must not normcase
    assert not table_rule_match(rules, "app", "ORDERS_2024")
    assert not table_rule_match(rules, "audit", "x")


def test_ngram_pairs_hold_no_cache(spark, sf_dir):
    """r18: ngram_jaccard_pairs must not persist anything — a cached
    intermediate served every warm bench pass as a scale-independent
    read (the cross-run result caching the optimization rounds forbid).
    Executing the frame twice leaves zero persisted RDDs behind."""
    from tigate_spark.functions import dedup as dd
    from tigate_spark.sources.batch import load_table

    docs = load_table(spark, sf_dir, "documents").limit(50)
    # compare RDD-id SETS, not counts: in the shared test session the
    # ContextCleaner can release other tests' cached RDDs concurrently
    # (count-equality flaked 8 -> 1 in a full run); the pinned property
    # is that THIS pipeline adds no persisted RDD of its own
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    before_ids = {int(k) for k in jmap.keySet().toArray()}
    a = dd.ngram_jaccard_pairs(docs)
    a.count()
    a.count()
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    after_ids = {int(k) for k in jmap.keySet().toArray()}
    assert not (after_ids - before_ids)


def test_ngram_df_cap_opt_out(spark, sf_dir):
    """df_cap=None restores exact full-universe Jaccard (opt-out path)."""
    from tigate_spark.functions import dedup as dd
    from tigate_spark.sources.batch import load_table

    docs = load_table(spark, sf_dir, "documents").limit(30)
    capped = dd.ngram_jaccard_pairs(docs).count()
    exact = dd.ngram_jaccard_pairs(docs, df_cap=None).count()
    assert exact >= capped
