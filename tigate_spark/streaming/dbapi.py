"""DBAPI driver seam for the executable apply sink.

The reference's MySQL writer classifies downstream errors three ways
(``pkg/sink/mysql/mysql_writer.go:646-668,727-764``,
``pkg/apperror/util.go:36-55``):

- **transient** — lock-wait timeout (1205), deadlock (1213), connection
  drops: roll back, back off, retry the txn batch.
- **ignorable DDL** — duplicate column (1060), table exists (1050),
  dup key name (1061), can't-drop-absent (1091/1054), database
  exists/drop-absent (1007/1008), multiple pk (1068), partition dup/
  drop-absent (1517/1507): an already-applied replay, treated as success
  (``apperror.IsIgnorableMySQLDDLError``).
- **fallback** — duplicate entry (1062) on a plain INSERT falls back to
  the safe-mode (REPLACE) form; a too-big packet (1153 server-side /
  4031 class) falls back from the multi-statement txn to
  one-statement-per-txn (``mysql_writer.go`` multiStmtFallback).

This module factors the connection + classifier out of the writer loop
(``streaming/sqlite_apply.py``) so sqlite:// (the sandbox's live engine)
and mysql:// (a real server, or a fake DBAPI driver injecting server
error CODES in tests) share one loop — only ``connect()`` and
``classify()`` differ.
"""

from __future__ import annotations

import sqlite3

#: classification labels the writer loop dispatches on
TRANSIENT = "transient"
IGNORABLE_DDL = "ignorable_ddl"
DUP_ENTRY = "dup_entry"
PACKET_OVERFLOW = "packet_overflow"
FATAL = "fatal"


class DDLCollisionError(RuntimeError):
    """A DDL that downstream STATE proves is NOT an already-applied
    replay (e.g. RENAME TABLE whose target exists while the source is
    still present) — never classified ignorable; the feed must surface
    it instead of silently swallowing a genuine name collision."""


class SqliteDriver:
    """Default driver: stdlib sqlite3, message-substring classification
    (SQLite reports no stable numeric codes through the DBAPI)."""

    scheme = "sqlite"
    #: the SQL dialect the bound backend EXECUTES — the DDL path
    #: translates MySQL statements onto this (sqlite) or passes them
    #: through verbatim (mysql: the server speaks the statement's own
    #: dialect, so PRAGMA-rebuilds / DROP INDEX-without-ON etc. must
    #: never reach it)
    dialect = "sqlite"
    #: exception types the writer loop catches and classifies; anything
    #: else propagates unclassified
    error_class = (sqlite3.OperationalError, sqlite3.IntegrityError)

    #: SQLite spellings of the reference's ignorable MySQL DDL class
    _IGNORABLE_DDL_MSGS = (
        "duplicate column name",   # ErrColumnExists (ADD COLUMN replay)
        "already exists",          # ErrTableExists / ErrIndexExists
        "no such column",          # ErrColumnNotExists (DROP COLUMN replay)
        "no such index",           # ErrKeyNotExists (DROP INDEX replay)
    )

    def connect(self, dsn: str):
        return sqlite3.connect(dsn, timeout=30)

    def classify(self, exc: BaseException) -> str:
        msg = str(exc).lower()
        if isinstance(exc, sqlite3.IntegrityError):
            return DUP_ENTRY if "unique" in msg else FATAL
        if any(p in msg for p in self._IGNORABLE_DDL_MSGS):
            return IGNORABLE_DDL
        if "lock" in msg or "busy" in msg:
            return TRANSIENT
        return FATAL


#: MySQL server error codes per class (the reference's taxonomy).
#: transient: ER_LOCK_WAIT_TIMEOUT, ER_LOCK_DEADLOCK + client-side
#: connection-loss codes (CR_CONN_HOST_ERROR, CR_SERVER_GONE_ERROR,
#: CR_SERVER_LOST) the go driver retries through dmretry.
MYSQL_TRANSIENT = frozenset({1205, 1213, 2003, 2006, 2013})
#: apperror.IsIgnorableMySQLDDLError's switch (util.go:44-55):
#: ErrDatabaseExists(1007), ErrDatabaseDropExists(1008),
#: ErrTableExists(1050), ErrTableDropExists(1051), ErrColumnExists(1060),
#: ErrDupKeyName(1061), ErrColumnNotExists/unknown column(1054),
#: ErrCantDropFieldOrKey(1091), ErrMultiplePriKey(1068),
#: ErrSameNamePartition(1517), ErrDropPartitionNonExistent(1507),
#: ErrKeyDoesNotExist(1176)
MYSQL_IGNORABLE_DDL = frozenset(
    {1007, 1008, 1050, 1051, 1054, 1060, 1061, 1068, 1091, 1176,
     1507, 1517})
#: ER_DUP_ENTRY — safe-mode fallback (mysql_writer.go:764 re-prepares
#: the batch in safe mode)
MYSQL_DUP_ENTRY = frozenset({1062})
#: ER_NET_PACKET_TOO_LARGE(1153) / the 4031 class — the multi-statement
#: txn exceeded max_allowed_packet; fall back to single-statement txns
MYSQL_PACKET = frozenset({1153, 4031})


def mysql_errno(exc: BaseException) -> int | None:
    """Server error code off a DBAPI exception: pymysql/MySQLdb carry it
    as ``args[0]``; mysql-connector as ``.errno``."""
    n = getattr(exc, "errno", None)
    if isinstance(n, int):
        return n
    args = getattr(exc, "args", ())
    if args and isinstance(args[0], int):
        return args[0]
    return None


class MySQLDriver:
    """Classify by server error code, the way the reference does
    (``go-sql-driver mysql.MySQLError.Number``). The classifier is the
    production surface; ``connect`` is a deliberate deployment seam:
    the writer loop hands it the LANE identity (the sqlite twin's
    per-lane file path), and a real deployment must register a driver
    (:func:`register_driver`) whose ``connect`` binds the sink URI's
    server and treats the lane as a session — the sandbox has no MySQL
    server nor DBAPI module, so this base class refuses loudly instead
    of pretending a lane path is a DSN. Tests register
    :class:`~tigate_spark.streaming.fake_mysql.FakeMySQLDriver`, which
    keeps this classify() and fakes only the socket."""

    scheme = "mysql"
    dialect = "mysql"  # a real server executes MySQL DDL verbatim
    error_class = (Exception,)  # DBAPI base varies by module; code-gated

    def connect(self, dsn: str):
        raise RuntimeError(
            "mysql:// sink has no connection binding in this "
            "environment: register a driver via tigate_spark.streaming."
            "dbapi.register_driver('mysql', ...) whose connect() opens "
            "the server session for the given lane (tests use "
            "fake_mysql.FakeMySQLDriver; a real deployment wraps "
            "pymysql/MySQLdb with the sink URI's host credentials)")

    def classify(self, exc: BaseException) -> str:
        n = mysql_errno(exc)
        if n in MYSQL_TRANSIENT:
            return TRANSIENT
        if n in MYSQL_IGNORABLE_DDL:
            return IGNORABLE_DDL
        if n in MYSQL_DUP_ENTRY:
            return DUP_ENTRY
        if n in MYSQL_PACKET:
            return PACKET_OVERFLOW
        return FATAL


class PyMySQLDriver(MySQLDriver):
    """Real-client DBAPI adapter: binds the sink URI's MySQL server
    through the **pymysql** API shape (``pymysql.connect(host, port,
    user, password, database, autocommit)``; exceptions carry the server
    code as ``args[0]`` — exactly what :func:`mysql_errno` reads, so the
    reference's code taxonomy classifies unchanged).

    The writer loop hands ``connect`` the LANE identity; each lane maps
    to its own server session against the same database — the
    per-worker MySQL connection of ``mysql_worker.go:90-135``. The
    client library is import-gated: ``connect_fn`` injects a
    pymysql-shaped callable so the contract suite runs this adapter
    against the fake server, and a real deployment leaves it None to
    use pymysql itself. Production swap = register this driver for the
    mysql:// scheme with the sink URI's credentials."""

    def __init__(self, uri: str = "mysql://root@localhost:3306/test",
                 connect_fn=None, dialect: str = "mysql"):
        from urllib.parse import urlparse

        #: an injected connect_fn may bind a SQLite-backed fake — the
        #: caller states what the backend executes
        self.dialect = dialect

        u = urlparse(uri)
        self.host = u.hostname or "localhost"
        self.port = int(u.port or 3306)
        self.user = u.username or "root"
        self.password = u.password or ""
        self.database = (u.path or "/").lstrip("/") or None
        self._connect_fn = connect_fn
        if connect_fn is None:
            try:
                import pymysql  # type: ignore

                self._connect_fn = pymysql.connect
                self.error_class = (pymysql.MySQLError,)
            except ImportError:
                self._connect_fn = None
        else:
            # injected fakes raise DBAPI-shaped exceptions; classify is
            # code-gated so the broad base stays correct
            self.error_class = (Exception,)

    def connect(self, dsn: str):
        """Open one lane session. ``dsn`` (the lane identity) is logged
        into the session via connection attrs territory — the server and
        database come from the sink URI this driver was built with."""
        if self._connect_fn is None:
            raise RuntimeError(
                "pymysql is not installed: install it (or inject "
                "connect_fn) to bind a real MySQL server")
        return self._connect_fn(
            host=self.host, port=self.port, user=self.user,
            password=self.password, database=self.database,
            autocommit=False)


_DRIVERS: dict[str, object] = {}


def register_driver(scheme: str, driver) -> None:
    """Install a driver for a sink-URI scheme (tests inject fake-MySQL
    drivers here; a production deployment registers a real JDBC/DBAPI
    wrapper)."""
    _DRIVERS[scheme] = driver


def get_driver(scheme: str, sink_uri: str | None = None):
    """Driver for a sink-URI scheme. Registered drivers win; otherwise
    sqlite:// gets the SQLite driver and mysql://tidb:// binds
    :class:`PyMySQLDriver` to the sink URI when the pymysql library is
    importable (the production swap is the URI alone) — falling back to
    the loud-refusal base when it is not."""
    if scheme in _DRIVERS:
        return _DRIVERS[scheme]
    if scheme == "sqlite":
        return SqliteDriver()
    if scheme in ("mysql", "tidb"):
        if sink_uri is not None:
            try:
                import pymysql  # type: ignore  # noqa: F401

                return PyMySQLDriver(sink_uri)
            except ImportError:
                pass
        return MySQLDriver()
    raise ValueError(f"no DBAPI driver for scheme {scheme!r}")
