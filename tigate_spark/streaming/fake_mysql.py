"""Fake-MySQL DBAPI driver: SQLite underneath, MySQL error CODES on top.

The sandbox has no MySQL server, so this driver closes the last
env-boundary gap the SQLite stand-in left open: the reference's writer
classifies failures by **server error code**
(``pkg/apperror/util.go:36-55``, ``mysql_writer.go:646-668``), which
SQLite's message-substring surface cannot exercise. This driver

- executes on a SQLite file (same dialect acceptance as sqlite://),
- translates SQLite's exceptions into :class:`FakeMySQLError` carrying
  the MySQL code the real server would return (1062 dup-entry, 1205
  lock-wait, 1060 duplicate column, ...),
- simulates the server-side ``max_allowed_packet`` bound (error 1153
  when a txn's accumulated arg bytes exceed it — the reference's
  fallbackToSeqWay trigger), and
- injects scripted one-shot errors (deadlock 1213, lock-wait 1205, ...)
  exactly once across all processes via O_EXCL marker files, so retry
  paths are provable under Spark's multi-process executors.

The classifier is the REAL one (:class:`~tigate_spark.streaming.dbapi.
MySQLDriver.classify` — inherited, not reimplemented), so every test
through this driver exercises the production code-path taxonomy.
"""

from __future__ import annotations

import os
import sqlite3

from tigate_spark.streaming.dbapi import MySQLDriver


class FakeMySQLError(Exception):
    """Shaped like pymysql's error: ``args[0]`` is the server code."""

    def __init__(self, errno: int, msg: str):
        super().__init__(errno, msg)
        self.errno = errno


#: SQLite message → MySQL server code (what a real server returns for
#: the same logical failure)
_MSG_TO_CODE = (
    ("duplicate column name", 1060),   # ER_DUP_FIELDNAME
    ("already exists", 1050),          # ER_TABLE_EXISTS_ERROR
    ("no such column", 1054),          # ER_BAD_FIELD_ERROR
    ("no such index", 1091),           # ER_CANT_DROP_FIELD_OR_KEY
    ("locked", 1205),                  # ER_LOCK_WAIT_TIMEOUT
    ("busy", 1205),
)


def _translate(exc: BaseException) -> FakeMySQLError:
    msg = str(exc)
    low = msg.lower()
    if isinstance(exc, sqlite3.IntegrityError):
        if "unique" in low:
            return FakeMySQLError(1062, f"Duplicate entry: {msg}")
        return FakeMySQLError(1048, msg)  # ER_BAD_NULL_ERROR class
    for pat, code in _MSG_TO_CODE:
        if pat in low:
            return FakeMySQLError(code, msg)
    return FakeMySQLError(1064, msg)  # ER_PARSE_ERROR / misc


class _FakeCursor:
    def __init__(self, cur: sqlite3.Cursor, conn: "_FakeConnection",
                 driver: "FakeMySQLDriver"):
        self._cur = cur
        self._conn = conn
        self._driver = driver

    def execute(self, sql: str, args=()):
        self._driver._maybe_inject(sql)
        if sql.strip().upper() == "BEGIN":
            self._conn._in_txn = True
            self._conn._txn_bytes = 0
        elif args and self._conn._in_txn:
            # server-side max_allowed_packet twin: the accumulated
            # packet for the open multi-statement txn. Only bytes
            # BETWEEN BEGIN and commit/rollback count — setup
            # statements (_ensure_meta, write-source recording) run
            # autocommit and must not pre-fill the packet, else a
            # small server_max_packet fires 1153 inside with_retry()
            # (TRANSIENT-only) instead of reaching the seq-way
            # oversized-txn fallback.
            self._conn._txn_bytes += len(repr(args))
            if (self._driver.server_max_packet is not None
                    and self._conn._txn_bytes
                    > self._driver.server_max_packet):
                self._conn._txn_bytes = 0
                raise FakeMySQLError(
                    1153, "Got a packet bigger than "
                    "'max_allowed_packet' bytes")
        try:
            self._cur.execute(sql, args)
        except (sqlite3.OperationalError, sqlite3.IntegrityError) as e:
            raise _translate(e) from e
        return self

    def executemany(self, sql: str, seq_of_args):
        """DBAPI executemany — the batch-dml lane path. Routes through
        execute() per row so the injection hooks and the server-side
        packet accounting see exactly what a statement-at-a-time run
        would (the multi-row wire still counts every row's bytes)."""
        for args in seq_of_args:
            self.execute(sql, args)
        return self

    def __iter__(self):
        return iter(self._cur)

    def fetchone(self):
        return self._cur.fetchone()

    def fetchall(self):
        return self._cur.fetchall()


class _FakeConnection:
    def __init__(self, con: sqlite3.Connection, driver: "FakeMySQLDriver"):
        self._con = con
        self._driver = driver
        self._in_txn = False
        self._txn_bytes = 0

    def cursor(self):
        return _FakeCursor(self._con.cursor(), self, self._driver)

    def commit(self):
        self._in_txn = False
        self._txn_bytes = 0
        self._con.commit()

    def rollback(self):
        self._in_txn = False
        self._txn_bytes = 0
        self._con.rollback()

    def close(self):
        self._con.close()

    def execute(self, sql: str, args=()):
        return self.cursor().execute(sql, args)


class FakeMySQLDriver(MySQLDriver):
    """``classify`` is MySQLDriver's (code-gated, the production path);
    only ``connect`` and the error surface are faked.

    ``inject``: list of ``(errno, sql_substring)`` — the first execute
    whose SQL contains the substring raises that server code, ONCE
    globally (marker files under ``inject_dir`` make once-ness hold
    across executor processes).
    ``server_max_packet``: simulate the server's max_allowed_packet —
    a txn accumulating more arg bytes than this raises 1153.
    """

    error_class = (FakeMySQLError,)
    #: MySQL error CODES on the wire, but the executing engine is
    #: SQLite — DDL must take the translation path
    dialect = "sqlite"

    def __init__(self, inject: list | None = None,
                 inject_dir: str | None = None,
                 server_max_packet: int | None = None):
        self.inject = list(inject or [])
        self.inject_dir = inject_dir
        self.server_max_packet = server_max_packet
        if self.inject and not self.inject_dir:
            raise ValueError("inject requires inject_dir (once-markers)")
        if self.inject_dir:
            os.makedirs(self.inject_dir, exist_ok=True)

    def connect(self, dsn: str):
        return _FakeConnection(sqlite3.connect(dsn, timeout=30), self)

    def _maybe_inject(self, sql: str) -> None:
        for i, (errno, pat) in enumerate(self.inject):
            if pat in sql:
                marker = os.path.join(self.inject_dir, f"inject-{i}.done")
                try:
                    fd = os.open(marker, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                except FileExistsError:
                    continue  # already fired once
                os.close(fd)
                raise FakeMySQLError(
                    int(errno), f"injected server error {errno}")
