"""Wide-payload (full-width schema) replication — unit pins for the
r16 self-review findings.

1. DDL-before-DML on a wide sink: exec_ddl materializes the base table
   WITH the wide columns, so the first widened REPLACE can't crash on
   'no column named ...' (schema-first changefeed start).
2. encode_mysql_sql extras of non-string, non-numeric dtype (timestamp/
   date) render QUOTED in the JSON args vector — an unquoted
   '1970-01-01 ...' would corrupt it.
3. The quantity_str wide lane is NULL-safe on both engines (Spark
   format_string renders a null arg as 'null' text; the oracle's printf
   returns NULL).
"""

from __future__ import annotations

import json

import duckdb
import pytest
from pyspark.sql import functions as F


def test_exec_ddl_creates_wide_base_table(spark, tmp_path):
    from tigate_spark.streaming.sqlite_apply import SqliteApplySink

    sink = SqliteApplySink(
        str(tmp_path / "lanes"), n_lanes=2,
        wide_cols=(("ship_date_str", "TEXT"), ("set_mask", "INTEGER")))
    # DDL arrives BEFORE any DML for t0 (schema-first start)
    out = sink.exec_ddl(
        "CREATE TABLE `app`.`t0` (pk bigint primary key)", "app", "t0", 0)
    # the lane pre-materializes the base table, so the CREATE itself
    # reads as an already-applied replay — what matters is the widened
    # schema the materialization left behind
    assert out in ("applied", "ignored")
    ch = spark.createDataFrame(
        [(1, "app", "t0", 0, "I", 10, 20, 7, "click", 500, 5,
          "2024-01-01", 3)],
        "seq long, schema_name string, table_name string, table_id long, "
        "op string, start_ts long, commit_ts long, pk long, "
        "event_type string, value_cents long, user_id long, "
        "ship_date_str string, set_mask long",
    )
    # must not raise 'table app__t0 has no column named ship_date_str'
    sink.process_batch(ch, batch_id=0)
    state = sink.read_state(
        spark, extra_cols=(("ship_date_str", "string"),
                           ("set_mask", "bigint")))
    row = state.first()
    assert (row["pk"], row["ship_date_str"], row["set_mask"]) == \
        (7, "2024-01-01", 3)


def test_timestamp_extra_renders_quoted_json(spark):
    from tigate_spark.functions.encoders import encode_mysql_sql

    df = spark.createDataFrame(
        [(1, "app", "t0", "I", 10, 20, 7, "x", 5)],
        "seq long, schema_name string, table_name string, op string, "
        "start_ts long, commit_ts long, pk long, event_type string, "
        "value_cents long",
    ).withColumn("ts_extra", F.timestamp_micros(F.lit(2))) \
     .withColumn("d_extra", F.to_date(F.lit("2024-03-04")))
    r = encode_mysql_sql(
        df, replicating_ts=0,
        extra_cols=(("ts_extra", False), ("d_extra", False))).first()
    args = json.loads(r["args"])  # would raise on unquoted timestamp
    assert args[0] == 7 and args[-1] == "2024-03-04"
    assert isinstance(args[3], str) and args[3].startswith("1970-01-01")


def test_boolean_extra_renders_bare_json(spark):
    from tigate_spark.functions.encoders import encode_mysql_sql

    df = spark.createDataFrame(
        [(1, "app", "t0", "I", 10, 20, 7, "x", 5, True)],
        "seq long, schema_name string, table_name string, op string, "
        "start_ts long, commit_ts long, pk long, event_type string, "
        "value_cents long, flag boolean",
    )
    r = encode_mysql_sql(df, replicating_ts=0,
                         extra_cols=(("flag", False),)).first()
    assert json.loads(r["args"])[-1] is True


def test_wide_payload_reaches_replica_sink(spark, tmp_path):
    """The replica:// scheme extends its payload columns with the wide
    lanes — the merged state carries the mounted wide values."""
    import os

    from tigate_spark.config import ChangefeedConfig
    from tigate_spark.streaming.changefeed import Changefeed
    from tigate_spark.streaming.sinks import read_replica

    sf_dir = os.environ.get("TIGATE_TEST_SF_DIR", "/root/testdata/sf0.001")
    cfg = ChangefeedConfig(
        changefeed_id="wide-replica", sink_uri="replica://",
        wide_payload=(("set_mask", "user_id % 8", "INTEGER"),))
    cf = Changefeed(spark, cfg, os.path.join(sf_dir, "events.parquet"),
                    str(tmp_path))
    cf.run_to_completion()
    state = read_replica(spark, cf.sink.state_dir)
    assert "set_mask" in state.columns
    rows = state.select("user_id", "set_mask").collect()
    assert rows and all(r["set_mask"] == r["user_id"] % 8 for r in rows)


@pytest.mark.parametrize("vc", [None, 150, 7])
def test_quantity_str_lane_null_safe_both_engines(spark, vc):
    from tigate_spark.catalog_streaming import _WIDE_LANES

    spark_e, duck_e = next(
        (s, d) for n, s, d, _, _ in _WIDE_LANES if n == "quantity_str")
    got_spark = spark.createDataFrame(
        [(vc,)], "value_cents long").selectExpr(f"{spark_e} AS q").first()["q"]
    got_duck = duckdb.sql(
        f"SELECT {duck_e} AS q FROM (SELECT CAST("
        f"{'NULL' if vc is None else vc} AS BIGINT) AS value_cents)"
    ).fetchone()[0]
    assert got_spark == got_duck
    if vc == 150:
        assert got_spark == "1.50"


def test_interval_extra_renders_quoted_json(spark):
    """'interval second' must not be treated as a bare-JSON integer just
    because 'int' prefixes it — an unquoted INTERVAL '02' SECOND would
    corrupt the args vector (r16 ADVICE)."""
    from tigate_spark.functions.encoders import encode_mysql_sql

    df = spark.createDataFrame(
        [(1, "app", "t0", "I", 10, 20, 7, "x", 5)],
        "seq long, schema_name string, table_name string, op string, "
        "start_ts long, commit_ts long, pk long, event_type string, "
        "value_cents long",
    ).withColumn("iv_extra", F.expr("INTERVAL '2' SECOND"))
    assert dict(df.dtypes)["iv_extra"].startswith("int")  # the trap
    r = encode_mysql_sql(df, replicating_ts=0,
                         extra_cols=(("iv_extra", False),)).first()
    args = json.loads(r["args"])  # raises on an unquoted INTERVAL token
    assert isinstance(args[-1], str) and "SECOND" in args[-1]


def test_wide_sink_rejects_ddl_widening_up_front(spark, tmp_path):
    """A full-width sink receiving add-column DDL evolution must fail
    fast with a configuration-level error at process_batch entry, not
    die inside statement rendering (r16 ADVICE)."""
    from tigate_spark.streaming.sqlite_apply import SqliteApplySink

    sink = SqliteApplySink(str(tmp_path / "lanes"), n_lanes=2,
                           wide_cols=(("set_mask", "INTEGER"),))
    ch = spark.createDataFrame(
        [(1, "app", "t0", 0, "I", 10, 20, 7, "click", 500, 3)],
        "seq long, schema_name string, table_name string, table_id long, "
        "op string, start_ts long, commit_ts long, pk long, "
        "event_type string, value_cents long, set_mask long",
    )
    with pytest.raises(ValueError, match="configuration error"):
        sink.process_batch(ch, batch_id=0, extra_tables=frozenset({0}))
    # nothing of the rejected batch reached the lanes
    assert sink.read_state(
        spark, extra_cols=(("set_mask", "bigint"),)).count() == 0
