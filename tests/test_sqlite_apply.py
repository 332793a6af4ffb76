"""Unit tests for the SQLite writer loop (streaming/sqlite_apply.py) —
the txn-batch / packet-bound / retry machinery the e2e entry drives but
cannot observe directly."""

from __future__ import annotations

import json
import sqlite3


def _stmts(n):
    out = []
    for i in range(n):
        out.append((
            "REPLACE INTO `app`.`t0` (`pk`,`event_type`,`value_cents`) "
            "VALUES (?,?,?)",
            json.dumps([i % 10, f"e{i}", i]),
        ))
    return out


def test_exec_lane_txn_batching_and_state(tmp_path):
    from tigate_spark.streaming.sqlite_apply import _exec_lane

    db = str(tmp_path / "lane-0.db")
    # txn_rows=7 over 100 stmts forces ~15 explicit txns; REPLACE on
    # pk%10 means final state is the last writer per pk
    _exec_lane(db, _stmts(100), txn_rows=7, max_packet=1 << 20)
    con = sqlite3.connect(db)
    rows = dict(
        (pk, (et, vc)) for pk, et, vc in con.execute(
            "SELECT pk, event_type, value_cents FROM `app__t0`")
    )
    con.close()
    assert rows == {i % 10: (f"e{i}", i) for i in range(90, 100)}


def test_exec_lane_packet_bound_flushes_early(tmp_path):
    from tigate_spark.streaming.sqlite_apply import _exec_lane

    db = str(tmp_path / "lane-1.db")
    # max_packet smaller than one arg vector: every statement flushes
    # its own txn; state must still converge
    _exec_lane(db, _stmts(20), txn_rows=1000, max_packet=4)
    con = sqlite3.connect(db)
    n = con.execute("SELECT count(*) FROM `app__t0`").fetchone()[0]
    con.close()
    assert n == 10


def test_exec_lane_retries_on_lock(tmp_path):
    from tigate_spark.streaming.sqlite_apply import _exec_lane

    db = str(tmp_path / "lane-2.db")
    _exec_lane(db, _stmts(1), txn_rows=10, max_packet=1 << 20)
    # hold a write lock briefly from a second connection with a short
    # busy window: the writer's backoff loop must eventually succeed
    blocker = sqlite3.connect(db, timeout=1, check_same_thread=False)
    blocker.execute("BEGIN IMMEDIATE")
    import threading

    def release():
        import time
        time.sleep(0.3)
        blocker.rollback()
        blocker.close()

    t = threading.Thread(target=release)
    t.start()
    _exec_lane(db, _stmts(5), txn_rows=10, max_packet=1 << 20)
    t.join()
    con = sqlite3.connect(db)
    n = con.execute("SELECT count(*) FROM `app__t0`").fetchone()[0]
    con.close()
    assert n == 5


def test_render_statement_stream_shape(spark, sf_dir):
    from tigate_spark.sources.changes import changes_stream
    from tigate_spark.streaming.sqlite_apply import (
        render_safe_mode_statements,
    )

    ch = changes_stream(spark, sf_dir)
    st = render_safe_mode_statements(ch, n_lanes=4)
    assert set(st.columns) == {"lane", "commit_ts", "start_ts", "opr",
                               "seq", "piece_no", "sql", "args"}
    sample = st.limit(50).collect()
    assert sample and all(0 <= r["lane"] < 4 for r in sample)
    # U splits into two pieces, D/I into one — piece counts per seq
    n_changes = ch.count()
    n_updates = ch.filter("op = 'U'").count()
    assert st.count() == n_changes + n_updates
