"""Partition-table routing (physical → logical) and the data-moving
partition DDL verbs on the executing SQLite sink.

Reference behavior pinned: DML from N physical partitions of one
logical table must merge into ONE downstream table
(``tests/integration_tests/partition_table/run.sh``;
``DMLEvent.PhysicalTableID``, ``pkg/common/event/dml_event.go:20-61``);
``EXCHANGE PARTITION`` swaps a partition's physical id with a
standalone table's id and, downstream, swaps the rows
(``logservice/schemastore/persist_storage.go:877-885,1391-1405``);
``TRUNCATE PARTITION`` drops the partition's rows
(scenario: ``alter table t truncate partition p3``).
"""

from __future__ import annotations

import sqlite3

import pytest
from pyspark.sql import functions as F

from tigate_spark.operators.partitions import (
    exchange_partition,
    partition_registry,
    resolve_logical,
)
from tigate_spark.streaming.sqlite_apply import (
    exec_ddl_on_lane,
    translate_ddl_for_sqlite,
)

#: logical t1 split into three hash partitions + standalone t3
_BASE_REG = [
    (1000, 0, 1, "app", "t1"),
    (1001, 0, 1, "app", "t1"),
    (1002, 0, 1, "app", "t1"),
    (103, 0, 3, "app", "t3"),
]

_EV_SCHEMA = ("schema_name string, table_name string, table_id long, "
              "physical_table_id long, commit_ts long, pk long")


def _ev(phys, ts, pk):
    return ("phys", f"p{phys}", phys, phys, ts, pk)


# -- registry resolution ------------------------------------------------------

def test_fan_in_routes_all_partitions_to_one_logical_table(spark):
    reg = partition_registry(spark, _BASE_REG)
    events = spark.createDataFrame(
        [_ev(1000, 10, 0), _ev(1001, 20, 1), _ev(1002, 30, 2),
         _ev(103, 40, 5)], _EV_SCHEMA)
    out = resolve_logical(events, reg).collect()
    by_pk = {r["pk"]: r for r in out}
    for pk in (0, 1, 2):
        assert by_pk[pk]["table_id"] == 1
        assert by_pk[pk]["table_name"] == "t1"
        assert by_pk[pk]["schema_name"] == "app"
    assert by_pk[5]["table_id"] == 3 and by_pk[5]["table_name"] == "t3"
    # the physical provenance column survives the routing
    assert by_pk[0]["physical_table_id"] == 1000


def test_unmapped_physical_ids_pass_through(spark):
    reg = partition_registry(spark, _BASE_REG)
    events = spark.createDataFrame(
        [("app", "t0", 0, 0, 10, 7)], _EV_SCHEMA)
    row = resolve_logical(events, reg).first()
    assert row["table_id"] == 0 and row["table_name"] == "t0"
    assert row["schema_name"] == "app"


def test_exchange_partition_flips_routing_as_of_ts(spark):
    rows = exchange_partition(_BASE_REG, 100, 1002, 103)
    reg = partition_registry(spark, rows)
    events = spark.createDataFrame(
        [_ev(1002, 50, 2), _ev(103, 50, 5),      # before the exchange
         _ev(1002, 150, 2), _ev(103, 150, 5)],   # after
        _EV_SCHEMA)
    out = {(r["physical_table_id"], r["commit_ts"]): r["table_name"]
           for r in resolve_logical(events, reg).collect()}
    assert out[(1002, 50)] == "t1" and out[(103, 50)] == "t3"
    assert out[(1002, 150)] == "t3" and out[(103, 150)] == "t1"


def test_exchange_partition_requires_mapped_ids():
    with pytest.raises(ValueError, match="unmapped"):
        exchange_partition(_BASE_REG, 100, 9999, 103)


def test_resolve_is_broadcast_no_event_shuffle(spark):
    """The routing join must broadcast the registry — no exchange on
    the event side (the 100 TB posture)."""
    reg = partition_registry(spark, _BASE_REG)
    events = spark.range(1000).select(
        F.lit("phys").alias("schema_name"),
        F.lit("p").alias("table_name"),
        F.lit(1).cast("long").alias("table_id"),
        (F.lit(1000) + F.col("id") % 3).alias("physical_table_id"),
        F.col("id").alias("commit_ts"),
        (F.col("id") % 50).alias("pk"))
    plan = resolve_logical(events, reg)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan
    # the only shuffle allowed is the interval-close window over the
    # DIM-SIZED registry itself; the event side never exchanges
    assert plan.count("Exchange") - plan.count("BroadcastExchange") <= 1


# -- executing sink: partition verbs with a registered scheme ----------------

_SCHEME = {"kind": "hash", "column": "pk", "parts": 3}


@pytest.fixture()
def lanes(tmp_path):
    """One lane holding logical t1 (pks 0-5) and standalone t3
    (pks 100-101); hash scheme pk%3 — partition p2 = pks {2, 5}."""
    db = str(tmp_path / "lane-0.db")
    exec_ddl_on_lane(db, "ALTER TABLE `app`.`t1` ADD INDEX `i` (`pk`)",
                     "app", "t1", 1)
    exec_ddl_on_lane(db, "ALTER TABLE `app`.`t3` ADD INDEX `i` (`pk`)",
                     "app", "t3", 3)
    con = sqlite3.connect(db)
    con.executemany(
        "INSERT INTO app__t1 (pk, event_type, value_cents) VALUES (?,?,?)",
        [(k, "t1row", 100 + k) for k in range(6)])
    con.executemany(
        "INSERT INTO app__t3 (pk, event_type, value_cents) VALUES (?,?,?)",
        [(100, "t3row", 900), (101, "t3row", 901)])
    con.commit()
    con.close()
    return db


def _pks(db, tbl):
    con = sqlite3.connect(db)
    rows = sorted(r[0] for r in con.execute(f"SELECT pk FROM {tbl}"))
    con.close()
    return rows


def test_truncate_partition_deletes_partition_rows(lanes):
    out = exec_ddl_on_lane(
        lanes, "ALTER TABLE `app`.`t1` TRUNCATE PARTITION p1",
        "app", "t1", 1, partition_scheme=_SCHEME, ddl_ts=500)
    assert out == "applied"
    assert _pks(lanes, "app__t1") == [0, 2, 3, 5]  # pk%3==1 gone
    # replay at the same ddl_ts is fenced
    assert exec_ddl_on_lane(
        lanes, "ALTER TABLE `app`.`t1` TRUNCATE PARTITION p1",
        "app", "t1", 1, partition_scheme=_SCHEME, ddl_ts=500) == "ignored"


def test_exchange_partition_swaps_rows(lanes):
    out = exec_ddl_on_lane(
        lanes,
        "ALTER TABLE `app`.`t1` EXCHANGE PARTITION p2 WITH TABLE `app`.`t3`",
        "app", "t1", 1, partition_scheme=_SCHEME, ddl_ts=600)
    assert out == "applied"
    # p2 rows (pk%3==2: 2,5) moved to t3; t3's rows moved into t1
    assert _pks(lanes, "app__t1") == [0, 1, 3, 4, 100, 101]
    assert _pks(lanes, "app__t3") == [2, 5]
    con = sqlite3.connect(lanes)
    assert {r[0] for r in con.execute(
        "SELECT event_type FROM app__t3")} == {"t1row"}
    con.close()
    # replay fenced — does NOT swap back
    assert exec_ddl_on_lane(
        lanes,
        "ALTER TABLE `app`.`t1` EXCHANGE PARTITION p2 WITH TABLE `app`.`t3`",
        "app", "t1", 1, partition_scheme=_SCHEME, ddl_ts=600) == "ignored"
    assert _pks(lanes, "app__t3") == [2, 5]
    # a LATER identical exchange (new ddl_ts) is a new DDL and runs:
    # t1's p2 class is now {101} (101%3==2; 100%3==1 stays), t3's rows
    # {2,5} move back in
    assert exec_ddl_on_lane(
        lanes,
        "ALTER TABLE `app`.`t1` EXCHANGE PARTITION p2 WITH TABLE `app`.`t3`",
        "app", "t1", 1, partition_scheme=_SCHEME, ddl_ts=700) == "applied"
    assert _pks(lanes, "app__t3") == [101]
    assert _pks(lanes, "app__t1") == [0, 1, 2, 3, 4, 5, 100]


def test_partition_verbs_stay_noop_without_scheme(lanes):
    out = exec_ddl_on_lane(
        lanes, "ALTER TABLE `app`.`t1` TRUNCATE PARTITION p1",
        "app", "t1", 1)
    assert out == "applied"
    assert _pks(lanes, "app__t1") == [0, 1, 2, 3, 4, 5]  # untouched


def test_translate_exchange_forms():
    action, stmts, meta = translate_ddl_for_sqlite(
        "ALTER TABLE `app`.`t1` EXCHANGE PARTITION p2 WITH TABLE `app`.`t3` "
        "WITHOUT VALIDATION", "app", "t1", _SCHEME)
    assert action == "exchange-partition"
    assert meta == {"other": "app__t3", "partition": "p2"}
    assert any("(`pk` % 3) = 2" in s for s in stmts)
    # no scheme → recognized no-op
    action, stmts, _ = translate_ddl_for_sqlite(
        "ALTER TABLE `app`.`t1` EXCHANGE PARTITION p2 WITH TABLE `app`.`t3`",
        "app", "t1")
    assert action == "partition" and stmts == []


def test_fan_in_composes_with_lww_apply(spark):
    """The routed stream feeds the standard apply/materialize shape:
    three physical partitions' writes to one pk space LWW-merge as ONE
    logical table (the downstream contract of partition_table/run.sh,
    independent of sink flavor)."""
    from tigate_spark.operators.apply import materialize

    reg = partition_registry(spark, _BASE_REG)
    rows = [
        # (schema, table, table_id, phys, commit_ts, pk) — two writers
        # of pk 2 from DIFFERENT physical partitions; latest wins
        ("phys", "p1000", 1000, 1000, 10, 2),
        ("phys", "p1001", 1001, 1001, 20, 2),
        ("phys", "p1002", 1002, 1002, 30, 7),
    ]
    ev = spark.createDataFrame(rows, _EV_SCHEMA).select(
        "*",
        F.lit("I").alias("op"), F.lit(0).cast("long").alias("start_ts"),
        F.col("commit_ts").alias("seq"),
        F.lit("click").alias("event_type"),
        (F.col("commit_ts") * 10).alias("value_cents"),
        F.lit(1).cast("long").alias("user_id"))
    out = materialize(resolve_logical(ev, reg),
                      ["event_type", "value_cents", "user_id"])
    state = {(r["table_id"], r["pk"]): r for r in out.collect()}
    assert set(state) == {(1, 2), (1, 7)}  # ONE logical table
    assert state[(1, 2)]["value_cents"] == 200  # commit_ts 20 won


def test_truncate_partition_list_and_all(lanes):
    """A comma-separated partition list deletes EVERY named partition's
    rows (MySQL truncates all of them); ALL empties the table."""
    out = exec_ddl_on_lane(
        lanes, "ALTER TABLE `app`.`t1` TRUNCATE PARTITION p1, p2",
        "app", "t1", 1, partition_scheme=_SCHEME, ddl_ts=500)
    assert out == "applied"
    assert _pks(lanes, "app__t1") == [0, 3]  # pk%3 in (1,2) gone
    assert exec_ddl_on_lane(
        lanes, "ALTER TABLE `app`.`t1` TRUNCATE PARTITION ALL",
        "app", "t1", 1, partition_scheme=_SCHEME, ddl_ts=510) == "applied"
    assert _pks(lanes, "app__t1") == []


def test_partition_name_edge_cases(lanes):
    import pytest as _pt

    # non p<digits> spellings raise clearly instead of mis-targeting
    with _pt.raises(ValueError, match="does not map"):
        exec_ddl_on_lane(
            lanes, "ALTER TABLE `app`.`t1` TRUNCATE PARTITION pmax",
            "app", "t1", 1, partition_scheme=_SCHEME, ddl_ts=520)
    with _pt.raises(ValueError, match="does not map"):
        exec_ddl_on_lane(
            lanes, "ALTER TABLE `app`.`t1` TRUNCATE PARTITION pp1",
            "app", "t1", 1, partition_scheme=_SCHEME, ddl_ts=521)
    with _pt.raises(ValueError, match="out of range"):
        exec_ddl_on_lane(
            lanes, "ALTER TABLE `app`.`t1` TRUNCATE PARTITION p7",
            "app", "t1", 1, partition_scheme=_SCHEME, ddl_ts=522)
    # rows untouched by the failed attempts
    assert _pks(lanes, "app__t1") == [0, 1, 2, 3, 4, 5]


def test_partition_data_ddl_requires_ddl_ts(lanes):
    import pytest as _pt

    with _pt.raises(ValueError, match="requires ddl_ts"):
        exec_ddl_on_lane(
            lanes, "ALTER TABLE `app`.`t1` TRUNCATE PARTITION p1",
            "app", "t1", 1, partition_scheme=_SCHEME)


def test_exchange_cross_lane_surfaces_clearly(tmp_path):
    """An exchange whose standalone table is NOT on the lane raises the
    co-location constraint by name (not a retried 'no such table')."""
    from tigate_spark.streaming import dbapi

    db = str(tmp_path / "lane-1.db")
    exec_ddl_on_lane(db, "ALTER TABLE `app`.`t1` ADD INDEX `i` (`pk`)",
                     "app", "t1", 1)
    with pytest.raises(dbapi.DDLCollisionError, match="share a lane"):
        exec_ddl_on_lane(
            db,
            "ALTER TABLE `app`.`t1` EXCHANGE PARTITION p2 "
            "WITH TABLE `app`.`t9`",
            "app", "t1", 1, partition_scheme=_SCHEME, ddl_ts=600)


def test_go_duration_interior_sign_rejected():
    from tigate_spark.streaming.kafka_clients import parse_go_duration_ms

    with pytest.raises(ValueError, match="invalid"):
        parse_go_duration_ms("1h-30m")
    with pytest.raises(ValueError, match="invalid"):
        parse_go_duration_ms("1h+30m")
    assert parse_go_duration_ms("+1h30m") == 5_400_000


# -- P1 rule-dispatch column selectors (kafka_column_selector scenario) -------

def test_column_selectors_first_match_dispatch(spark):
    from tigate_spark.config import ColumnSelector
    from tigate_spark.operators.projections import column_selectors

    rows = [("app", "t0", 0, 0, 1, 1, "click", 100, 5),
            ("app", "t1", 1, 1, 1, 2, "view", 200, 6),
            ("other", "t9", 9, 9, 1, 3, "buy", 300, 7)]
    df = spark.createDataFrame(
        rows, "schema_name string, table_name string, table_id long, "
              "physical_table_id long, commit_ts long, pk long, "
              "event_type string, value_cents long, user_id long")
    rules = [
        # first rule: t0 keeps only event_type
        ColumnSelector(matcher=["app.t0"], columns=["event_type"]),
        # second rule ALSO matches t0 but must not apply (first wins);
        # t1 keeps value_cents + user_id
        ColumnSelector(matcher=["app.t*"],
                       columns=["value_cents", "user_id"]),
    ]
    out = {r["table_name"]: r for r in column_selectors(df, rules).collect()}
    t0 = out["t0"]
    assert t0["event_type"] == "click"
    assert t0["value_cents"] is None and t0["user_id"] is None
    t1 = out["t1"]
    assert t1["event_type"] is None
    assert t1["value_cents"] == 200 and t1["user_id"] == 6
    # unmatched table: DefaultColumnSelector keeps everything
    t9 = out["t9"]
    assert (t9["event_type"], t9["value_cents"], t9["user_id"]) \
        == ("buy", 300, 7)
    # handle key + metadata always survive
    assert t0["pk"] == 1 and t0["commit_ts"] == 1


# -- storage + redo composition (csv_storage_partition_table,
#    consistent_partition_table scenarios) -----------------------------------

def test_fan_in_through_storage_sink_dated_tree(spark, tmp_path):
    """csv_storage_partition_table/: N physical partitions' changes land
    under ONE logical table directory in the dated tree — the physical
    ids never become path components."""
    from tigate_spark.streaming.sinks import StorageSink, read_storage

    reg = partition_registry(spark, _BASE_REG)
    rows = [("phys", f"p{1000 + i % 3}", 1000 + i % 3, 1000 + i % 3,
             1_704_067_200_000_000 + i, i % 9) for i in range(30)]
    ev = spark.createDataFrame(rows, _EV_SCHEMA).select(
        "*", F.lit("I").alias("op"),
        F.lit(0).cast("long").alias("start_ts"),
        F.col("commit_ts").alias("seq"),
        F.lit("click").alias("event_type"),
        F.lit(100).cast("long").alias("value_cents"),
        F.lit(1).cast("long").alias("user_id"))
    sink = StorageSink(str(tmp_path / "store"))
    sink.process_batch(resolve_logical(ev, reg), 0)
    back = read_storage(spark, str(tmp_path / "store"))
    tables = {r["table_name"] for r in
              back.select("table_name").distinct().collect()}
    assert tables == {"t1"}  # one logical dir, no p100x leaves
    assert back.count() == 30


def test_fan_in_through_redo_log(spark, tmp_path):
    """consistent_partition_table/: the WAL records the LOGICAL routing,
    so redo_apply restores the fan-in state after a downstream loss."""
    from tigate_spark.streaming.redo import RedoLog

    reg = partition_registry(spark, _BASE_REG)
    rows = [("phys", f"p{1000 + i % 3}", 1000 + i % 3, 1000 + i % 3,
             1_704_067_200_000_000 + i, i % 9) for i in range(30)]
    ev = spark.createDataFrame(rows, _EV_SCHEMA).select(
        "*", F.lit("I").alias("op"),
        F.lit(0).cast("long").alias("start_ts"),
        F.col("commit_ts").alias("seq"),
        F.lit("click").alias("event_type"),
        F.lit(100).cast("long").alias("value_cents"),
        F.lit(1).cast("long").alias("user_id"))
    routed = resolve_logical(ev, reg)
    redo = RedoLog(str(tmp_path / "redo"))
    lo = routed.agg(F.min("commit_ts")).collect()[0][0]
    hi = routed.agg(F.max("commit_ts")).collect()[0][0]
    redo.log_batch(routed, 0, lo=lo, hi=hi)
    logged = spark.read.parquet(str(tmp_path / "redo" / "row"))
    assert logged.filter("table_id <> 1").count() == 0
    assert logged.count() == 30


# -- P6 sibling: split only pk/uk-changing updates ----------------------------

def test_split_updates_on_key_change(spark):
    """csv_storage_update_pk_* scenarios: a pk-changing UPDATE becomes
    DELETE(old key)+INSERT(new key); key-stable updates stay single."""
    from tigate_spark.operators.projections import (
        split_updates_on_key_change,
    )

    rows = [
        # key-stable update: stays ONE event
        ("U", '{"pk":1,"v":10}', '{"pk":1,"v":11}'),
        # pk-changing update: splits
        ("U", '{"pk":2,"v":20}', '{"pk":3,"v":20}'),
        ("I", None, '{"pk":4,"v":40}'),
        ("D", '{"pk":5,"v":50}', None),
    ]
    df = spark.createDataFrame(rows, "op string, before string, after string")
    out = split_updates_on_key_change(df).collect()
    assert len(out) == 5  # 1 + 2 + 1 + 1
    split = sorted((r["op"], r["piece_no"], r["image"]) for r in out
                   if '"v":20' in (r["image"] or ""))
    assert split == [("D", 1, '{"pk":2,"v":20}'),
                     ("I", 2, '{"pk":3,"v":20}')]
    stable = [r for r in out if '"v":11' in (r["image"] or "")]
    assert len(stable) == 1 and stable[0]["op"] == "U"


# -- first-class changefeed wiring (cfg.partition_mappings) -------------------

def test_changefeed_partition_mappings_fan_in(spark, sf_dir, tmp_path):
    """A changefeed configured with partition_mappings fan-ins a
    partitioned upstream through the REAL streaming path: the source
    tags t1 rows with three physical ids via _physical_table_id, and
    the replica ends keyed by the LOGICAL table."""
    from tigate_spark.config import ChangefeedConfig
    from tigate_spark.operators.apply import materialize
    from tigate_spark.streaming.changefeed import PAYLOAD_COLS, Changefeed
    from tigate_spark.streaming.sinks import read_replica

    src = str(tmp_path / "src")
    base = spark.read.parquet(sf_dir + "/events.parquet").limit(4000)
    base.withColumn(
        "_physical_table_id",
        F.when(F.col("user_id") % 4 == 1,
               F.lit(1000) + (F.col("event_id") % 200) % 3)
        .otherwise(F.lit(100) + F.col("user_id") % 4).cast("long"),
    ).coalesce(1).write.parquet(src)
    cfg = ChangefeedConfig(
        changefeed_id="cf-part", sink_uri="replica://",
        partition_mappings=[
            (1000, 0, 1, "app", "t1"), (1001, 0, 1, "app", "t1"),
            (1002, 0, 1, "app", "t1"),
            (100, 0, 0, "app", "t0"), (102, 0, 2, "app", "t2"),
            (103, 0, 3, "app", "t3"),
        ])
    cf = Changefeed(spark, cfg, src, str(tmp_path / "work"))
    cf.run_to_completion()
    got = read_replica(spark, cf.sink.state_dir).select(
        "table_id", "pk", *PAYLOAD_COLS)
    assert got.filter("table_id >= 100").count() == 0  # no physical ids
    from tigate_spark.sources.changes import normalize_events

    # the physical routing is information-free for final state: the
    # logical identity equals the plain normalization's
    exp = materialize(
        normalize_events(spark.read.parquet(src)),
        PAYLOAD_COLS).select("table_id", "pk", *PAYLOAD_COLS)
    assert got.count() == exp.count()
    assert got.exceptAll(exp).count() == 0


def test_column_selectors_folded_form_hash_equal(spark):
    """The wide-rule folded plan (r16 verdict task #3) must be
    value-identical to the measured-fast nested dispatch on the same
    frame — overlapping matchers, negation rules, unmatched rows and a
    rule count straddling realistic widths all pinned."""
    from tigate_spark.config import ColumnSelector
    from tigate_spark.operators.projections import column_selectors

    rows = [(f"app{i % 3}", f"t{i % 7}", i % 7, i % 7, 100 + i, i,
             f"e{i % 5}", i * 10, i % 9) for i in range(60)]
    df = spark.createDataFrame(
        rows, "schema_name string, table_name string, table_id long, "
              "physical_table_id long, commit_ts long, pk long, "
              "event_type string, value_cents long, user_id long")
    rules = []
    for i in range(41):
        rules.append(ColumnSelector(
            matcher=[f"app{i % 3}.t{i % 5}", "app9.*"],
            columns=["*", f"!{'event_type' if i % 2 else 'user_id'}"]
            if i % 3 else ["value_cents", "pk"]))
    key = ["schema_name", "table_name", "pk"]
    nested = [tuple(r) for r in
              column_selectors(df, rules, fold=False)
              .orderBy(*key).collect()]
    folded = [tuple(r) for r in
              column_selectors(df, rules, fold=True)
              .orderBy(*key).collect()]
    assert nested == folded
    # both non-trivial: some NULLed cells and some untouched rows
    assert any(v is None for row in nested for v in row)
    assert any(None not in row for row in nested)
