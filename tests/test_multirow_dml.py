"""Multi-row REPLACE rendering (r16 verdict task #6): batch-dml's real
win on MySQL is the driver's multi-row rewrite — one ``REPLACE INTO ...
VALUES (...),(...),...`` per adjacent same-table run instead of one
driver round per row. ``coalesce_multirow_statements`` renders it
explicitly; these tests replay BOTH forms on the fake-MySQL driver
(packet accounting armed) and pin: same LWW state, fewer statements,
every statement under the row/packet caps, and the exact golden SQL
text on a hand-built run."""

from __future__ import annotations

import json
import os

SF_DIR = os.environ.get("TIGATE_TEST_SF_DIR", "/root/testdata/sf0.001")


def _replay(driver, db_path: str, rows, per_stmt_txn: bool = False):
    """Execute (schema, table, sql, args_json) rows in order; returns
    the final (table, pk) -> (event_type, value_cents) state."""
    con = driver.connect(db_path)
    cur = con.cursor()
    made: set[str] = set()
    for schema, table, sql, args in rows:
        local = f"{schema}__{table}"
        if local not in made:
            cur.execute(
                f"CREATE TABLE IF NOT EXISTS `{local}` (pk INTEGER "
                "PRIMARY KEY, event_type TEXT, value_cents INTEGER)")
            con.commit()
            made.add(local)
        sql = sql.replace(f"`{schema}`.`{table}`", f"`{local}`")
        sql = sql.replace(" LIMIT 1", "")
        if per_stmt_txn:
            cur.execute("BEGIN")
        cur.execute(sql, json.loads(args))
        if per_stmt_txn:
            con.commit()
    con.commit()
    state = {}
    for local in made:
        for pk, et, vc in cur.execute(
                f"SELECT pk, event_type, value_cents FROM `{local}`"):
            state[(local, pk)] = (et, vc)
    con.close()
    return state


def test_multirow_converges_to_lww_with_fewer_statements(spark, tmp_path):
    from tigate_spark.sources.changes import changes_stream
    from tigate_spark.streaming.fake_mysql import FakeMySQLDriver
    from tigate_spark.streaming.sqlite_apply import (
        coalesce_multirow_statements, render_safe_mode_statements)

    ch = changes_stream(spark, SF_DIR)
    stmts = render_safe_mode_statements(ch)
    order = ["lane", "commit_ts", "start_ts", "table_id", "opr", "seq",
             "piece_no"]
    single = [(r["schema_name"], r["table_name"], r["sql"], r["args"])
              for r in stmts.orderBy(*order).collect()]

    max_rows, max_packet = 8, 256
    multi_df = coalesce_multirow_statements(
        stmts, max_rows=max_rows, max_packet=max_packet)
    multi_rows = multi_df.orderBy("lane", "stmt_seq").collect()
    multi = [(r["schema_name"], r["table_name"], r["sql"], r["args"])
             for r in multi_rows]

    # genuinely fewer driver rounds, genuinely multi-row, caps held
    assert len(multi) < len(single)
    assert max(r["n_rows"] for r in multi_rows) > 1
    assert all(r["n_rows"] <= max_rows for r in multi_rows)
    assert sum(r["n_rows"] for r in multi_rows) == len(single)
    # packet bound: each statement's arg bytes <= cap + one row's args
    biggest_row = max(len(a) for _, _, _, a in single)
    for r in multi_rows:
        assert len(r["args"]) - 2 <= max_packet + biggest_row

    # replay both forms on the fake-MySQL driver; the multi-row replay
    # runs one txn per statement with server-side packet accounting
    # armed at the proven bound — 1153 would fail the test
    drv = FakeMySQLDriver(server_max_packet=max_packet + biggest_row + 2)
    s1 = _replay(drv, str(tmp_path / "single.db"), single)
    s2 = _replay(drv, str(tmp_path / "multi.db"), multi,
                 per_stmt_txn=True)
    assert s1 and s1 == s2


def test_multirow_golden_sql(spark):
    """Exact statement text for a hand-built run: 3 adjacent REPLACEs
    coalesce, the DELETE passes through, the trailing 2 coalesce."""
    from tigate_spark.streaming.sqlite_apply import (
        coalesce_multirow_statements, render_safe_mode_statements)

    rows = [(i, "app", "t0", 0, op, 10 + i, 20 + i, i, f"e{i}", 100 * i)
            for i, op in enumerate("IIIDII")]
    ch = spark.createDataFrame(
        rows, "seq long, schema_name string, table_name string, "
              "table_id long, op string, start_ts long, commit_ts long, "
              "pk long, event_type string, value_cents long")
    out = coalesce_multirow_statements(
        render_safe_mode_statements(ch)).orderBy("stmt_seq").collect()
    assert [r["n_rows"] for r in out] == [3, 1, 2]
    assert out[0]["sql"] == (
        "REPLACE INTO `app`.`t0` (`pk`,`event_type`,`value_cents`) "
        "VALUES (?,?,?),(?,?,?),(?,?,?)")
    assert json.loads(out[0]["args"]) == [0, "e0", 0, 1, "e1", 100,
                                          2, "e2", 200]
    assert out[1]["sql"].startswith("DELETE FROM `app`.`t0`")
    assert out[2]["sql"].endswith("VALUES (?,?,?),(?,?,?)")
    assert json.loads(out[2]["args"]) == [4, "e4", 400, 5, "e5", 500]


def test_multirow_row_cap_splits_runs(spark):
    """A 10-REPLACE run at max_rows=4 splits 4/4/2, order preserved."""
    from tigate_spark.streaming.sqlite_apply import (
        coalesce_multirow_statements, render_safe_mode_statements)

    rows = [(i, "app", "t0", 0, "I", 10 + i, 20 + i, i, "x", i)
            for i in range(10)]
    ch = spark.createDataFrame(
        rows, "seq long, schema_name string, table_name string, "
              "table_id long, op string, start_ts long, commit_ts long, "
              "pk long, event_type string, value_cents long")
    out = coalesce_multirow_statements(
        render_safe_mode_statements(ch), max_rows=4).orderBy(
        "stmt_seq").collect()
    assert [r["n_rows"] for r in out] == [4, 4, 2]
    assert [json.loads(r["args"])[0] for r in out] == [0, 4, 8]


def test_multirow_caps_hold_under_skewed_arg_sizes(spark):
    """Self-review repro regression: the original greatest(row-bucket,
    byte-bucket) grouping violated BOTH caps when one criterion split a
    run and the other counter kept advancing. Two large-args rows
    followed by many tiny ones (byte split early, then a long tail) and
    a tiny-then-medium mix (row split first, bytes accumulating) must
    each respect max_rows AND the packet bound per statement."""
    from tigate_spark.streaming.sqlite_apply import (
        coalesce_multirow_statements, render_safe_mode_statements)

    def caps_hold(events, max_rows, max_packet):
        ch = spark.createDataFrame(
            events, "seq long, schema_name string, table_name string, "
                    "table_id long, op string, start_ts long, "
                    "commit_ts long, pk long, event_type string, "
                    "value_cents long")
        stmts = render_safe_mode_statements(ch)
        singles = stmts.orderBy("commit_ts", "piece_no").collect()
        biggest = max(len(r["args"]) for r in singles)
        out = coalesce_multirow_statements(
            stmts, max_rows=max_rows, max_packet=max_packet).collect()
        assert sum(r["n_rows"] for r in out) == len(singles)
        for r in out:
            assert r["n_rows"] <= max_rows, out
            assert len(r["args"]) - 2 <= max_packet + biggest, out
        return out

    # repro 1: two ~200-byte args then 14 tiny — the byte counter
    # crosses early; the row counter must still cap the tail
    ev1 = [(i, "app", "t0", 0, "I", 10 + i, 20 + i, i,
            ("X" * 180) if i < 2 else "s", i) for i in range(16)]
    out1 = caps_hold(ev1, max_rows=8, max_packet=256)
    # repro 2: 8 tiny then 8 ~55-byte args — the row counter splits
    # first; the byte bound must still hold inside the second group
    ev2 = [(i, "app", "t0", 0, "I", 10 + i, 20 + i, i,
            "s" if i < 8 else ("Y" * 50), i) for i in range(16)]
    out2 = caps_hold(ev2, max_rows=8, max_packet=256)
    assert any(r["n_rows"] > 1 for r in out1 + out2)


def test_multirow_live_sink_matches_plain_sink(spark, tmp_path):
    """The LIVE executable path (multirow_dml=True): same micro-batch
    through the plain and multi-row sinks lands the same state, and the
    fence still short-circuits a replay."""
    from tigate_spark.sources.changes import changes_stream
    from tigate_spark.streaming.sqlite_apply import SqliteApplySink

    ch = changes_stream(spark, SF_DIR)
    plain = SqliteApplySink(str(tmp_path / "plain"), n_lanes=2)
    multi = SqliteApplySink(str(tmp_path / "multi"), n_lanes=2,
                            multirow_dml=True)
    plain.process_batch(ch, batch_id=0)
    multi.process_batch(ch, batch_id=0)
    multi.process_batch(ch, batch_id=0)  # fence replay: must no-op
    key = ["table_id", "pk"]
    a = [tuple(r) for r in plain.read_state(spark).orderBy(*key).collect()]
    b = [tuple(r) for r in multi.read_state(spark).orderBy(*key).collect()]
    assert a and a == b


def test_multirow_requires_split_txn(tmp_path):
    import pytest

    from tigate_spark.streaming.sqlite_apply import SqliteApplySink

    with pytest.raises(ValueError, match="transaction-atomicity"):
        SqliteApplySink(str(tmp_path / "x"), multirow_dml=True,
                        split_txn=False)


def test_multirow_changefeed_uri_e2e(spark, tmp_path):
    """sqlite://?batch-dml-multirow=true through the full changefeed
    equals the engine's LWW materialization."""
    import os

    from tigate_spark.catalog import get_catalog
    from tigate_spark.config import ChangefeedConfig
    from tigate_spark.streaming.changefeed import Changefeed

    cfg = ChangefeedConfig(
        changefeed_id="multirow-e2e",
        sink_uri="sqlite://?batch-dml-multirow=true&max-txn-row=16")
    cf = Changefeed(spark, cfg, os.path.join(SF_DIR, "events.parquet"),
                    str(tmp_path))
    assert cf.sink.multirow_dml and cf.sink.txn_rows == 16
    cf.run_to_completion()
    got = {(r["table_id"], r["pk"]): (r["event_type"], r["value_cents"])
           for r in cf.sink.read_state(spark).collect()}
    want = {(m["table_id"], m["pk"]): (m["event_type"], m["value_cents"])
            for m in get_catalog()["apply_materialize"]
            .builder(spark, SF_DIR).collect()}
    assert got == want


def test_multirow_survives_values_in_identifier(spark):
    """A backticked table name containing ' VALUES ' must not corrupt
    the multi-row rebuild (no re-parsing of identifier text) and the
    row bound must hold exactly: a 15-row remainder followed by a full
    run cannot merge into a 31-row downstream txn (second self-review
    findings, both pinned here)."""
    from tigate_spark.streaming.sqlite_apply import (
        coalesce_multirow_statements, render_safe_mode_statements)

    rows = [(i, "app", "t VALUES x", 0, "I", 10 + i, 20 + i, i, "e", i)
            for i in range(5)]
    ch = spark.createDataFrame(
        rows, "seq long, schema_name string, table_name string, "
              "table_id long, op string, start_ts long, commit_ts long, "
              "pk long, event_type string, value_cents long")
    out = coalesce_multirow_statements(
        render_safe_mode_statements(ch)).orderBy("stmt_seq").collect()
    assert [r["n_rows"] for r in out] == [5]
    assert out[0]["sql"] == (
        "REPLACE INTO `app`.`t VALUES x` (`pk`,`event_type`,"
        "`value_cents`) VALUES " + ",".join(["(?,?,?)"] * 5))


def test_multirow_txn_weight_never_exceeds_bound(spark, tmp_path):
    """Executable-path check for the weighted flush: with txn_rows=16,
    a lane stream whose coalesced statements are a 16-row full run and
    a 15-row remainder must apply cleanly with every downstream txn
    <= 16 rows (the fake driver's packet counter is per-txn, so arm a
    packet bound that a 31-row merged txn would blow)."""
    from tigate_spark.streaming.fake_mysql import FakeMySQLDriver
    from tigate_spark.streaming.sqlite_apply import SqliteApplySink

    rows = [(i, "app", "t0", 0, "I", 10 + i, 20 + i, i, "e", i)
            for i in range(31)]
    ch = spark.createDataFrame(
        rows, "seq long, schema_name string, table_name string, "
              "table_id long, op string, start_ts long, commit_ts long, "
              "pk long, event_type string, value_cents long")
    # one row's args ~= 12 bytes; 16 rows ~= 200, 31 rows ~= 390 —
    # bound between them so a merged 31-row txn raises 1153
    drv = FakeMySQLDriver(server_max_packet=280)
    sink = SqliteApplySink(str(tmp_path / "lanes"), n_lanes=1,
                           txn_rows=16, multirow_dml=True, driver=drv)
    sink.process_batch(ch, batch_id=0)  # must not raise
    assert sink.read_state(spark).count() == 31
