"""Widened executable-DDL statement matrix on the live SQLite writer
(r12): add/drop index, rename table, modify column, truncate, drop
table — each action executes on a lane DB the way the reference's MySQL
writer does (mysql_writer.go:600-668 execDDL) and each REPLAY lands in
the per-action ignorable class (apperror.IsIgnorableMySQLDDLError,
util.go:36-55) or state-based skip (the shouldExecDDLByTs analog)."""

from __future__ import annotations

import sqlite3

import pytest

from tigate_spark.streaming import dbapi
from tigate_spark.streaming.sqlite_apply import (
    exec_ddl_on_lane,
    translate_ddl_for_sqlite,
)


@pytest.fixture()
def lane(tmp_path):
    db = str(tmp_path / "lane-0.db")
    # seed the base table through the DDL path itself (schema-first)
    exec_ddl_on_lane(
        db, "ALTER TABLE `app`.`t1` ADD COLUMN `extra` INTEGER DEFAULT 0",
        "app", "t1", 1)
    con = sqlite3.connect(db)
    con.execute("INSERT INTO app__t1 (pk, event_type, value_cents, extra) "
                "VALUES (1, 'click', 100, 0), (2, 'view', 200, 0)")
    con.commit()
    con.close()
    return db


def _master(db, typ):
    con = sqlite3.connect(db)
    rows = {r[0] for r in con.execute(
        "SELECT name FROM sqlite_master WHERE type=?", (typ,))}
    con.close()
    return rows


def _tables_map(db):
    con = sqlite3.connect(db)
    rows = dict(con.execute("SELECT name, table_id FROM _tables"))
    con.close()
    return rows


def test_add_column_then_replay_ignored(lane):
    out = exec_ddl_on_lane(
        lane, "ALTER TABLE `app`.`t1` ADD COLUMN `extra` INTEGER DEFAULT 0",
        "app", "t1", 1)
    assert out == "ignored"  # ErrColumnExists(1060) analog


@pytest.mark.parametrize("form", [
    "ALTER TABLE `app`.`t1` ADD INDEX `by_et` (`event_type`)",
    "CREATE INDEX `by_et` ON `app`.`t1` (`event_type`)",
])
def test_add_index_both_forms_and_replay(lane, form):
    assert exec_ddl_on_lane(lane, form, "app", "t1", 1) == "applied"
    assert "app__t1__by_et" in _master(lane, "index")
    # replay → ErrDupKeyName(1061) analog, ignored
    assert exec_ddl_on_lane(lane, form, "app", "t1", 1) == "ignored"


@pytest.mark.parametrize("form", [
    "ALTER TABLE `app`.`t1` DROP INDEX `by_et`",
    "DROP INDEX `by_et` ON `app`.`t1`",
])
def test_drop_index_both_forms_and_replay(lane, form):
    exec_ddl_on_lane(
        lane, "CREATE INDEX `by_et` ON `app`.`t1` (`event_type`)",
        "app", "t1", 1)
    assert exec_ddl_on_lane(lane, form, "app", "t1", 1) == "applied"
    assert "app__t1__by_et" not in _master(lane, "index")
    # replay → ErrKeyDoesNotExist(1176)/ErrCantDropFieldOrKey(1091) analog
    assert exec_ddl_on_lane(lane, form, "app", "t1", 1) == "ignored"


@pytest.mark.parametrize("form", [
    "RENAME TABLE `app`.`t1` TO `app`.`t1_archive`",
    "ALTER TABLE `app`.`t1` RENAME TO `t1_archive`",
])
def test_rename_table_updates_mapping_and_replay(lane, form):
    assert exec_ddl_on_lane(lane, form, "app", "t1", 1) == "applied"
    assert "app__t1_archive" in _master(lane, "table")
    assert "app__t1" not in _master(lane, "table")
    # read_state resolves by table_id through _tables — mapping followed
    assert _tables_map(lane) == {"app__t1_archive": 1}
    con = sqlite3.connect(lane)
    assert con.execute("SELECT count(*) FROM app__t1_archive") \
        .fetchone()[0] == 2
    con.close()
    # replay: target exists → state-based skip (shouldExecDDLByTs analog)
    assert exec_ddl_on_lane(lane, form, "app", "t1", 1) == "ignored"
    assert _tables_map(lane) == {"app__t1_archive": 1}


def test_modify_column_rebuild_preserves_rows_and_indexes(lane):
    exec_ddl_on_lane(
        lane, "CREATE INDEX `by_et` ON `app`.`t1` (`event_type`)",
        "app", "t1", 1)
    out = exec_ddl_on_lane(
        lane, "ALTER TABLE `app`.`t1` MODIFY COLUMN `value_cents` "
        "BIGINT UNSIGNED", "app", "t1", 1)
    assert out == "applied"
    con = sqlite3.connect(lane)
    info = {r[1]: r[2] for r in con.execute("PRAGMA table_info(app__t1)")}
    assert info["value_cents"] == "INTEGER"  # BIGINT → INTEGER affinity
    rows = sorted(con.execute(
        "SELECT pk, event_type, value_cents, extra FROM app__t1"))
    assert rows == [(1, "click", 100, 0), (2, "view", 200, 0)]
    # pk stays the primary key; indexes survive the rebuild
    assert {r[1]: r[5] for r in
            con.execute("PRAGMA table_info(app__t1)")}["pk"] == 1
    con.close()
    assert "app__t1__by_et" in _master(lane, "index")
    # replay: the rebuild is naturally idempotent
    assert exec_ddl_on_lane(
        lane, "ALTER TABLE `app`.`t1` MODIFY COLUMN `value_cents` "
        "BIGINT UNSIGNED", "app", "t1", 1) == "applied"


def test_truncate_and_drop_table_with_replay(lane):
    assert exec_ddl_on_lane(
        lane, "TRUNCATE TABLE `app`.`t1`", "app", "t1", 1) == "applied"
    con = sqlite3.connect(lane)
    assert con.execute("SELECT count(*) FROM app__t1").fetchone()[0] == 0
    con.close()
    assert exec_ddl_on_lane(
        lane, "DROP TABLE `app`.`t1`", "app", "t1", 1) == "applied"
    assert "app__t1" not in _master(lane, "table")
    assert _tables_map(lane) == {}
    # replay: table gone → ErrTableDropExists(1051) analog, state skip
    assert exec_ddl_on_lane(
        lane, "DROP TABLE IF EXISTS `app`.`t1`", "app", "t1", 1) == "ignored"


def test_unrecognized_ddl_falls_through_localized(lane):
    action, stmts, _ = translate_ddl_for_sqlite(
        "ALTER TABLE `app`.`t1` AUTO_INCREMENT = 5", "app", "t1")
    assert action == "query"
    assert stmts == ["ALTER TABLE `app__t1` AUTO_INCREMENT = 5"]


def test_translate_matrix_shapes():
    a, s, m = translate_ddl_for_sqlite(
        "ALTER TABLE `app`.`t2` ADD UNIQUE INDEX `u1` (`pk`, `user_id`)",
        "app", "t2")
    assert a == "add-index" and "UNIQUE INDEX" in s[0]
    a, s, m = translate_ddl_for_sqlite(
        "ALTER TABLE `app`.`t2` MODIFY `note` VARCHAR(64)", "app", "t2")
    assert a == "modify-column" and m == {"column": "note", "decl": "TEXT"}
    a, s, m = translate_ddl_for_sqlite(
        "TRUNCATE `app`.`t2`", "app", "t2")
    assert a == "truncate-table" and s == ["DELETE FROM `app__t2`"]
    # a statement for a DIFFERENT table is not misrouted
    a, s, m = translate_ddl_for_sqlite(
        "DROP TABLE `app`.`other`", "app", "t2")
    assert a == "query"


def test_concurrent_rename_attempts_serialize(lane):
    """Two racing executors replaying the same RENAME barrier: the lane
    flock serializes them — exactly one applies, the other sees the
    renamed target and skips (the zombie-attempt story extended to the
    widened DDL matrix)."""
    import threading

    results: list[str] = []

    def run():
        results.append(exec_ddl_on_lane(
            lane, "RENAME TABLE `app`.`t1` TO `app`.`t1_x`", "app", "t1", 1))

    ts = [threading.Thread(target=run) for _ in range(2)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert sorted(results) == ["applied", "ignored"]
    assert _tables_map(lane) == {"app__t1_x": 1}
    con = sqlite3.connect(lane)
    n = con.execute("SELECT count(*) FROM app__t1_x").fetchone()[0]
    con.close()
    assert n == 2  # rows survived exactly once


def test_concurrent_add_index_attempts_serialize(lane):
    import threading

    results: list[str] = []

    def run():
        results.append(exec_ddl_on_lane(
            lane, "CREATE INDEX `ix` ON `app`.`t1` (`event_type`)",
            "app", "t1", 1))

    ts = [threading.Thread(target=run) for _ in range(3)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert sorted(results) == ["applied", "ignored", "ignored"]
    assert "app__t1__ix" in _master(lane, "index")


def test_mysql_dialect_driver_gets_raw_passthrough(tmp_path):
    """A real MySQL-dialect backend must receive the ORIGINAL statement
    — never the SQLite translations (PRAGMA rebuild, DROP INDEX without
    ON, _tables bookkeeping)."""
    executed: list[str] = []

    class _Cur:
        def execute(self, sql, args=()):
            executed.append(sql)

    class _Con:
        def cursor(self):
            return _Cur()

        def commit(self):
            pass

        def rollback(self):
            pass

        def close(self):
            pass

    class _StubMySQL:
        scheme = "mysql"
        dialect = "mysql"
        error_class = (Exception,)

        def connect(self, dsn):
            return _Con()

        def classify(self, exc):
            return "fatal"

    q = "ALTER TABLE `app`.`t1` MODIFY COLUMN `value_cents` BIGINT UNSIGNED"
    out = exec_ddl_on_lane(str(tmp_path / "lane-0.db"), q, "app", "t1", 1,
                           driver=_StubMySQL())
    assert out == "applied"
    assert executed == [q]  # verbatim, no PRAGMA, no meta tables


def test_modify_rebuild_preserves_not_null_and_default(lane):
    """The rebuild must carry untouched columns' NOT NULL/DEFAULT —
    MySQL's MODIFY leaves other columns' constraints intact."""
    con = sqlite3.connect(lane)
    con.execute("ALTER TABLE app__t1 ADD COLUMN flagged INTEGER "
                "NOT NULL DEFAULT 7")
    con.commit()
    con.close()
    exec_ddl_on_lane(
        lane, "ALTER TABLE `app`.`t1` MODIFY COLUMN `value_cents` BIGINT",
        "app", "t1", 1)
    con = sqlite3.connect(lane)
    info = {r[1]: (r[3], r[4]) for r in
            con.execute("PRAGMA table_info(app__t1)")}
    assert info["flagged"] == (1, "7")  # NOT NULL + DEFAULT survived
    # and the default still APPLIES on inserts that omit the column
    con.execute("INSERT INTO app__t1 (pk, event_type, value_cents) "
                "VALUES (9, 'x', 1)")
    con.commit()
    got = con.execute(
        "SELECT flagged FROM app__t1 WHERE pk = 9").fetchone()[0]
    con.close()
    assert got == 7


def test_prefix_length_index_translates(lane):
    """MySQL prefix-length index parts (`col`(10)) index the whole
    column in SQLite instead of falling through as raw MySQL syntax."""
    out = exec_ddl_on_lane(
        lane, "ALTER TABLE `app`.`t1` ADD INDEX `p10` (`event_type`(10))",
        "app", "t1", 1)
    assert out == "applied"
    assert "app__t1__p10" in _master(lane, "index")


def test_rename_collision_surfaces_not_swallowed(lane):
    """r12 ADVICE: a rename whose target exists while the SOURCE is
    still present is a genuine collision between two distinct tables —
    it must raise, not be mistaken for an already-applied replay."""
    # materialize a DIFFERENT table that happens to hold the target name
    exec_ddl_on_lane(
        lane, "ALTER TABLE `app`.`t1_archive` ADD COLUMN `x` INTEGER",
        "app", "t1_archive", 2)
    with pytest.raises(dbapi.DDLCollisionError):
        exec_ddl_on_lane(
            lane, "RENAME TABLE `app`.`t1` TO `t1_archive`", "app", "t1", 1)
    # both tables untouched
    assert {"app__t1", "app__t1_archive"} <= _master(lane, "table")


def test_rename_reprefixes_lane_indexes(lane):
    """r12 ADVICE: the `{tbl}__{name}` index namespace must follow a
    RENAME TABLE so a later DROP INDEX against the NEW table name
    resolves (previously it missed and was silently 'ignored')."""
    exec_ddl_on_lane(
        lane, "CREATE INDEX `by_et` ON `app`.`t1` (`event_type`)",
        "app", "t1", 1)
    exec_ddl_on_lane(
        lane, "RENAME TABLE `app`.`t1` TO `t2`", "app", "t1", 1)
    assert "app__t2__by_et" in _master(lane, "index")
    assert "app__t1__by_et" not in _master(lane, "index")
    out = exec_ddl_on_lane(
        lane, "DROP INDEX `by_et` ON `app`.`t2`", "app", "t2", 1)
    assert out == "applied"          # NOT 'ignored' — the drop resolved
    assert "app__t2__by_et" not in _master(lane, "index")


def test_rename_column_executes_and_replays(lane):
    """r13: rename-column is an explicit action class executed natively
    (SQLite ALTER TABLE ... RENAME COLUMN); replay lands in the
    ErrBadField(1054) analog and is ignored."""
    q = "ALTER TABLE `app`.`t1` RENAME COLUMN `event_type` TO `etype`"
    assert exec_ddl_on_lane(lane, q, "app", "t1", 1) == "applied"
    con = sqlite3.connect(lane)
    cols = [r[1] for r in con.execute("PRAGMA table_info(app__t1)")]
    con.close()
    assert "etype" in cols and "event_type" not in cols
    assert exec_ddl_on_lane(lane, q, "app", "t1", 1) == "ignored"


@pytest.mark.parametrize("action,form", [
    ("add-foreign-key",
     "ALTER TABLE `app`.`t1` ADD CONSTRAINT `fk_u` FOREIGN KEY (`user_id`) "
     "REFERENCES `app`.`users` (`id`)"),
    ("add-foreign-key",
     "ALTER TABLE `app`.`t1` ADD FOREIGN KEY (`user_id`) "
     "REFERENCES `app`.`users` (`id`)"),
    ("drop-foreign-key", "ALTER TABLE `app`.`t1` DROP FOREIGN KEY `fk_u`"),
    ("partition",
     "ALTER TABLE `app`.`t1` ADD PARTITION "
     "(PARTITION p2 VALUES LESS THAN (3000))"),
    ("partition", "ALTER TABLE `app`.`t1` DROP PARTITION p1"),
    ("partition", "ALTER TABLE `app`.`t1` TRUNCATE PARTITION p1"),
    ("partition",
     "ALTER TABLE `app`.`t1` REORGANIZE PARTITION p1 INTO "
     "(PARTITION p1a VALUES LESS THAN (100), "
     "PARTITION p1b VALUES LESS THAN (200))"),
    ("partition",
     "ALTER TABLE `app`.`t1` EXCHANGE PARTITION p1 WITH TABLE `app`.`t1x`"),
])
def test_noop_classes_are_recognized_and_bookkept(lane, action, form):
    """r13: FK and partition ops have no SQLite analog — they classify
    explicitly (not raw-SQL fall-through), bookkeep in _ddl_noops, and
    a replay reports 'ignored' via the bookkeeping key."""
    got_action, stmts, _meta = translate_ddl_for_sqlite(form, "app", "t1")
    assert got_action == action and stmts == []
    assert exec_ddl_on_lane(lane, form, "app", "t1", 1) == "applied"
    con = sqlite3.connect(lane)
    noops = dict(con.execute("SELECT sql, action FROM _ddl_noops"))
    con.close()
    assert noops == {form: action}
    assert exec_ddl_on_lane(lane, form, "app", "t1", 1) == "ignored"
    # the table's data is untouched by the no-op
    con = sqlite3.connect(lane)
    assert con.execute("SELECT count(*) FROM app__t1").fetchone()[0] == 2
    con.close()


@pytest.mark.parametrize("q", [
    "ALTER TABLE `app`.`t1` RENAME COLUMN `event_type` TO `etype`",
    "ALTER TABLE `app`.`t1` ADD FOREIGN KEY (`user_id`) "
    "REFERENCES `app`.`users` (`id`)",
    "ALTER TABLE `app`.`t1` DROP FOREIGN KEY `fk_u`",
    "ALTER TABLE `app`.`t1` EXCHANGE PARTITION p1 WITH TABLE `app`.`t1x`",
    "ALTER TABLE `app`.`t1` REORGANIZE PARTITION p1 INTO "
    "(PARTITION p1a VALUES LESS THAN (100))",
])
def test_new_classes_passthrough_verbatim_on_mysql_dialect(tmp_path, q):
    """On a mysql-dialect backend every new class runs the ORIGINAL
    statement verbatim — no no-op substitution, no bookkeeping tables."""
    executed: list[str] = []

    class _Cur:
        def execute(self, sql, args=()):
            executed.append(sql)

    class _Con:
        cursor = lambda self: _Cur()          # noqa: E731
        commit = rollback = close = lambda self: None  # noqa: E731

    class _StubMySQL:
        scheme = dialect = "mysql"
        error_class = (Exception,)
        connect = lambda self, dsn: _Con()    # noqa: E731
        classify = lambda self, exc: "fatal"  # noqa: E731

    out = exec_ddl_on_lane(str(tmp_path / "lane-0.db"), q, "app", "t1", 1,
                           driver=_StubMySQL())
    assert out == "applied"
    assert executed == [q]
