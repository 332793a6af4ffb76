"""DBAPI driver seam — the fake-MySQL error-code injection matrix.

Proves the writer loop's retry/ignorable/fallback classes against the
reference's MySQL taxonomy (``pkg/apperror/util.go:36-55``,
``mysql_writer.go:646-668,766``) using server error CODES, which the
SQLite stand-in's message substrings cannot exercise: 1205 lock-wait /
1213 deadlock → rollback+retry; 1062 dup-entry → safe-mode (REPLACE)
fallback; 1153 max-packet → one-statement-per-txn fallback; the
ignorable-DDL code set → already-applied replay. sqlite:// behavior is
pinned unchanged by the existing test_sqlite_apply.py suite."""

from __future__ import annotations

import json
import sqlite3

import pytest

from tigate_spark.streaming import dbapi
from tigate_spark.streaming.fake_mysql import FakeMySQLDriver, FakeMySQLError
from tigate_spark.streaming.sqlite_apply import _exec_lane, exec_ddl_on_lane


def _stmts(n, start=0, verb="REPLACE"):
    out = []
    for i in range(start, start + n):
        out.append((
            "app", "t0", 0,
            f"{verb} INTO `app`.`t0` (`pk`,`event_type`,`value_cents`) "
            "VALUES (?,?,?)",
            json.dumps([i % 10, f"e{i}", i]),
        ))
    return out


def _state(db):
    con = sqlite3.connect(db)
    rows = dict(
        (pk, (et, vc)) for pk, et, vc in con.execute(
            "SELECT pk, event_type, value_cents FROM `app__t0`")
    )
    con.close()
    return rows


_FINAL = {i % 10: (f"e{i}", i) for i in range(90, 100)}


# -- classifier: the production code path, reference code sets -------------

@pytest.mark.parametrize("errno,kind", [
    (1205, dbapi.TRANSIENT), (1213, dbapi.TRANSIENT),
    (2013, dbapi.TRANSIENT),
    (1050, dbapi.IGNORABLE_DDL), (1060, dbapi.IGNORABLE_DDL),
    (1061, dbapi.IGNORABLE_DDL), (1091, dbapi.IGNORABLE_DDL),
    (1054, dbapi.IGNORABLE_DDL), (1007, dbapi.IGNORABLE_DDL),
    (1068, dbapi.IGNORABLE_DDL), (1517, dbapi.IGNORABLE_DDL),
    (1062, dbapi.DUP_ENTRY),
    (1153, dbapi.PACKET_OVERFLOW), (4031, dbapi.PACKET_OVERFLOW),
    (1064, dbapi.FATAL), (1146, dbapi.FATAL),
])
def test_mysql_classifier_taxonomy(errno, kind):
    assert dbapi.MySQLDriver().classify(
        FakeMySQLError(errno, "x")) == kind


def test_mysql_errno_extraction_variants():
    assert dbapi.mysql_errno(FakeMySQLError(1062, "dup")) == 1062

    class ArgsOnly(Exception):
        pass

    assert dbapi.mysql_errno(ArgsOnly(1213, "deadlock")) == 1213
    assert dbapi.mysql_errno(ArgsOnly("no code")) is None


# -- retry class: 1205 / 1213 roll back and converge ------------------------

@pytest.mark.parametrize("errno", [1205, 1213])
def test_transient_code_retries_and_converges(tmp_path, errno):
    drv = FakeMySQLDriver(
        inject=[(errno, "REPLACE INTO `app__")],
        inject_dir=str(tmp_path / "inj"))
    db = str(tmp_path / "lane-0.db")
    _exec_lane(db, _stmts(100), txn_rows=7, max_packet=1 << 20, driver=drv)
    assert _state(db) == _FINAL


def test_fatal_code_propagates(tmp_path):
    drv = FakeMySQLDriver(
        inject=[(1146, "REPLACE INTO `app__")],  # ER_NO_SUCH_TABLE: not retryable
        inject_dir=str(tmp_path / "inj"))
    db = str(tmp_path / "lane-0.db")
    with pytest.raises(FakeMySQLError):
        _exec_lane(db, _stmts(10), txn_rows=7, max_packet=1 << 20,
                   driver=drv)


# -- fallback class: 1062 dup-entry → safe-mode REPLACE ---------------------

def test_dup_entry_falls_back_to_safe_mode(tmp_path):
    """A GENUINE duplicate key on a plain INSERT (not an injection): the
    server returns 1062, the writer re-renders the txn's INSERTs as
    REPLACEs and the retry converges to last-writer-wins."""
    drv = FakeMySQLDriver()
    db = str(tmp_path / "lane-0.db")
    _exec_lane(db, _stmts(10, verb="INSERT"), txn_rows=100,
               max_packet=1 << 20, driver=drv)  # pks 0..9 now exist
    # second wave INSERTs the same pks with newer values → 1062 → REPLACE
    _exec_lane(db, _stmts(10, start=90, verb="INSERT"), txn_rows=100,
               max_packet=1 << 20, driver=drv)
    assert _state(db) == _FINAL


# -- fallback class: 1153 max-packet → one-statement-per-txn ----------------

def test_packet_overflow_falls_back_to_seq_way(tmp_path):
    """The writer's own max_packet bound is set HIGH, the fake server's
    LOW: the multi-statement txn trips 1153 and the seq-way fallback
    (one statement per txn, each under the server bound) converges."""
    drv = FakeMySQLDriver(server_max_packet=100)
    db = str(tmp_path / "lane-0.db")
    _exec_lane(db, _stmts(100), txn_rows=50, max_packet=1 << 20,
               driver=drv)
    assert _state(db) == _FINAL


# -- ignorable DDL class by code --------------------------------------------

def test_ddl_replay_ignored_by_server_code(tmp_path):
    drv = FakeMySQLDriver()
    db = str(tmp_path / "lane-0.db")
    ddl = "ALTER TABLE `app`.`t0` ADD COLUMN `extra_cents` BIGINT"
    assert exec_ddl_on_lane(db, ddl, "app", "t0", 0, driver=drv) \
        == "applied"
    # the replay raises sqlite 'duplicate column name' → fake translates
    # to 1060 → MySQLDriver.classify → ignorable → 'ignored'
    assert exec_ddl_on_lane(db, ddl, "app", "t0", 0, driver=drv) \
        == "ignored"


def test_ddl_injected_codes_matrix(tmp_path):
    drv_ok = FakeMySQLDriver(
        inject=[(1050, "CREATE INDEX")],
        inject_dir=str(tmp_path / "inj1"))
    db = str(tmp_path / "lane-0.db")
    # injected 1050 (table exists) on an otherwise-fine DDL → ignored
    assert exec_ddl_on_lane(
        db, "CREATE INDEX `i0` ON `app`.`t0` (`event_type`)",
        "app", "t0", 0, driver=drv_ok) == "ignored"
    # injected transient 1205 → retried → applied
    drv_retry = FakeMySQLDriver(
        inject=[(1205, "CREATE INDEX")],
        inject_dir=str(tmp_path / "inj2"))
    assert exec_ddl_on_lane(
        db, "CREATE INDEX `i1` ON `app`.`t0` (`event_type`)",
        "app", "t0", 0, driver=drv_retry) == "applied"


# -- mysql:// scheme end-to-end through the Changefeed ----------------------

def test_mysql_scheme_feed_with_injected_errors(spark, sf_dir, tmp_path,
                                                monkeypatch):
    """A mysql://-scheme changefeed runs the full streaming path through
    the fake driver with a scripted lock-wait AND a low server packet
    bound, and the downstream still hash-matches the LWW oracle."""
    import os

    from tigate_spark.config import ChangefeedConfig
    from tigate_spark.operators.apply import materialize
    from tigate_spark.sources.changes import changes_stream
    from tigate_spark.streaming.changefeed import Changefeed

    drv = FakeMySQLDriver(
        inject=[(1205, "REPLACE INTO `app__"),
                (1213, "REPLACE INTO `app__")],
        inject_dir=str(tmp_path / "inj"),
        server_max_packet=2_000)
    monkeypatch.setitem(dbapi._DRIVERS, "mysql", drv)
    cfg = ChangefeedConfig(
        changefeed_id="cf-mysql-fake",
        sink_uri="mysql://root@127.0.0.1:3306/app?max-txn-row=64")
    cf = Changefeed(spark, cfg, os.path.join(sf_dir, "events.parquet"),
                    str(tmp_path))
    cf.run_to_completion()
    got = cf.sink.read_state(spark)  # deletes are physically gone
    exp = (
        materialize(changes_stream(spark, sf_dir),
                    ["event_type", "value_cents"])
        .select("table_id", "pk", "event_type", "value_cents")
    )
    assert got.count() == exp.count() > 0
    assert got.exceptAll(exp).count() == 0
    assert exp.exceptAll(got).count() == 0
    # both scripted injections actually fired
    fired = sorted(os.listdir(str(tmp_path / "inj")))
    assert fired == ["inject-0.done", "inject-1.done"]
