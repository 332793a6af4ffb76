"""K1 executable-sink twin: a REAL writer loop applying the engine's
rendered MySQL SQL to a live SQL engine inside the streaming path.

The sandbox has no MySQL server, so SQLite (stdlib) stands in — it
accepts the generated dialect (backtick quoting, REPLACE INTO,
``UPDATE/DELETE ... LIMIT 1`` when compiled with the limit extension;
probed per connection and stripped when absent). Everything around the
socket is the reference's MySQL sink shape
(``pkg/sink/mysql/mysql_writer.go:727-755`` execDML loop,
``mysql_worker.go:90-135`` worker lanes):

- **foreachBatch → foreachPartition**: each micro-batch renders the
  safe-mode statement stream (``encode_mysql_sql(safe_mode_split=True)``
  — REPLACE + P6 update split, the idempotent replay form) and executes
  it on the EXECUTORS, one sequential writer per worker lane.
- **Worker lanes** (R8): ``lane = table_id % n_lanes``; the batch is
  hash-repartitioned by lane so a lane never spans partitions — one
  SQLite file per lane, one connection per lane per batch, zero write
  contention by construction (the reference's per-worker MySQL
  connection).
- **Txn batching + packet bound**: statements execute inside explicit
  transactions, committed every ``txn_rows`` statements or when the
  accumulated arg bytes exceed ``max_packet`` (the maxAllowedPacket
  fallback boundary, ``mysql_writer.go`` multiStmtFallback) — whichever
  comes first.
- **Retry**: transient lock/busy errors roll back and retry the current
  txn batch with backoff; safe-mode statements are idempotent, so a
  retried batch (or a replayed micro-batch after a crash between sink
  commit and checkpoint commit) converges to the same last-writer-wins
  state — the same exactly-once story the reference's safe mode gives a
  non-transactional downstream.

Ordering: statements are sorted within each lane partition by the LWW
tie-break ``(commit_ts, start_ts, D<U<I on the original op, seq,
piece_no)``; micro-batches arrive in commit order from the file source,
so per-key statement order is globally correct.

Scale posture: the writer loop is per-partition imperative by necessity
(it drives a socket protocol, not a computation); all rendering stays
declarative JVM-side. At 100 TB the same class pointed at a JDBC URL is
the real MySQL sink — only the ``connect()`` line changes.
"""

from __future__ import annotations

import os
import sqlite3
import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: default worker-lane count (mirrors operators.txn.FLUSH_LANES spirit)
DEFAULT_LANES = 4


def render_safe_mode_statements(changes: DataFrame,
                                n_lanes: int = DEFAULT_LANES) -> DataFrame:
    """Changes → ordered, lane-keyed safe-mode statement stream:
    (lane, commit_ts, start_ts, opr, seq, piece_no, sql, args)."""
    from tigate_spark.functions.encoders import encode_mysql_sql

    enc = encode_mysql_sql(changes, replicating_ts=0, safe_mode_split=True)
    keys = changes.select(
        "seq", "commit_ts", "start_ts",
        F.expr("case op when 'D' then 1 when 'U' then 2 else 3 end")
        .alias("opr"),
        (F.col("table_id") % F.lit(n_lanes)).cast("bigint").alias("lane"),
    )
    return enc.join(keys, "seq").select(
        "lane", "commit_ts", "start_ts", "opr", "seq", "piece_no",
        "sql", "args",
    )


def _exec_lane(db_path: str, stmts, txn_rows: int, max_packet: int,
               retries: int = 5) -> None:
    """Sequential writer for ONE lane: explicit txns of <= txn_rows
    statements / <= max_packet arg bytes, retry-with-backoff on
    transient busy errors. ``stmts`` is an iterable of (sql, args_json)
    already in apply order."""
    import json

    con = sqlite3.connect(db_path, timeout=30)
    cur = con.cursor()
    # probe the LIMIT extension once per connection (MySQL always has it)
    try:
        cur.execute("CREATE TEMP TABLE _probe(x INTEGER)")
        cur.execute("UPDATE _probe SET x = 1 LIMIT 1")
        strip_limit = False
    except sqlite3.OperationalError:
        strip_limit = True
    cur.execute("DROP TABLE IF EXISTS _probe")
    made: set[str] = set()
    pending: list[tuple[str, list]] = []
    pending_bytes = 0

    def flush() -> None:
        nonlocal pending, pending_bytes
        if not pending:
            return
        for attempt in range(retries):
            try:
                cur.execute("BEGIN")
                for s, a in pending:
                    cur.execute(s, a)
                con.commit()
                pending, pending_bytes = [], 0
                return
            except sqlite3.OperationalError as e:  # locked/busy: retry
                con.rollback()
                if attempt == retries - 1 or "lock" not in str(e).lower():
                    raise
                time.sleep(0.05 * (2 ** attempt))

    for sql, args_json in stmts:
        head = sql.split("`")
        schema, table = head[1], head[3]
        tbl = f"{schema}__{table}"
        if tbl not in made:
            flush()  # DDL outside the DML txn, like the reference
            cur.execute(
                f"CREATE TABLE IF NOT EXISTS `{tbl}` "
                "(pk INTEGER PRIMARY KEY, event_type TEXT, "
                "value_cents INTEGER)"
            )
            con.commit()
            made.add(tbl)
        sql = sql.replace(f"`{schema}`.`{table}`", f"`{tbl}`")
        if strip_limit:
            sql = sql.replace(" LIMIT 1", "")
        pending.append((sql, json.loads(args_json)))
        pending_bytes += len(args_json)
        if len(pending) >= txn_rows or pending_bytes >= max_packet:
            flush()
    flush()
    con.close()


class SqliteApplySink:
    """foreachBatch sink executing the rendered statement stream on
    per-lane SQLite files via foreachPartition."""

    def __init__(self, db_dir: str, n_lanes: int = DEFAULT_LANES,
                 txn_rows: int = 256, max_packet: int = 64 * 1024):
        self.db_dir = db_dir
        self.n_lanes = n_lanes
        self.txn_rows = txn_rows
        self.max_packet = max_packet
        os.makedirs(db_dir, exist_ok=True)

    def process_batch(self, changes: DataFrame, batch_id: int) -> None:
        stmts = render_safe_mode_statements(changes, self.n_lanes)
        db_dir, txn_rows, max_packet = \
            self.db_dir, self.txn_rows, self.max_packet

        def run_partition(rows) -> None:
            # a hash partition may hold several whole lanes; each lane
            # replays sequentially on its own connection
            by_lane: dict[int, list] = {}
            for r in rows:
                by_lane.setdefault(r["lane"], []).append(r)
            for lane, rs in by_lane.items():
                rs.sort(key=lambda r: (r["commit_ts"], r["start_ts"],
                                       r["opr"], r["seq"], r["piece_no"]))
                _exec_lane(
                    os.path.join(db_dir, f"lane-{lane}.db"),
                    ((r["sql"], r["args"]) for r in rs),
                    txn_rows, max_packet,
                )

        (stmts.repartition(self.n_lanes, "lane")
              .foreachPartition(run_partition))

    def read_state(self, spark) -> DataFrame:
        """Union of all lane DBs as (table_id, pk, event_type,
        value_cents) — the downstream's live state. Driver-side read of
        a bounded replica (the verification surface; a real deployment
        scans back through a JDBC source instead)."""
        rows = []
        for f in sorted(os.listdir(self.db_dir)):
            if not f.endswith(".db"):
                continue
            con = sqlite3.connect(os.path.join(self.db_dir, f))
            cur = con.cursor()
            tables = [t for (t,) in cur.execute(
                "SELECT name FROM sqlite_master WHERE type='table' "
                "AND name LIKE '%__t%'")]
            for t in tables:
                tid = int(t.rsplit("__t", 1)[1])
                for pk, et, vc in cur.execute(
                        f"SELECT pk, event_type, value_cents FROM `{t}`"):
                    rows.append((tid, pk, et, vc))
            con.close()
        return spark.createDataFrame(
            rows,
            "table_id bigint, pk bigint, event_type string, "
            "value_cents bigint",
        )
