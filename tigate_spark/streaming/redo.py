"""Redo log — consistent replication / disaster recovery.

The reference's redo feature (config surface
``pkg/config/consistent.go:28-67``; behavior pinned by the
``consistent_replicate_*`` integration tests): with
``consistent.level = 'eventual'`` the changefeed write-ahead-logs every
row change to external storage BEFORE the sink applies it and keeps a
meta file of (checkpoint_ts, resolved_ts); if the downstream is lost,
``cdc redo apply`` replays the logs up to the recorded resolved-ts,
restoring a transactionally-consistent downstream.

Spark-native shape:

- :class:`RedoLog` — one parquet dir per micro-batch under
  ``storage/row/batch=<id>/`` written with ``mode('overwrite')``, so a
  REPLAYED micro-batch (crash between redo flush and checkpoint commit)
  rewrites its own logs instead of duplicating them — the WAL is
  idempotent by layout. The meta file is swapped atomically
  (tmp + rename): ``resolved_ts`` advances when a batch's logs are
  durably down (the reference's log-flush-then-advance ordering),
  ``checkpoint_ts`` when the sink finished applying it, so
  ``checkpoint_ts <= resolved_ts`` always — the recovery window is
  exactly the gap.
- :func:`redo_apply` — the ``cdc redo apply`` binary's job: read meta,
  replay every logged row with ``commit_ts <= resolved_ts`` through the
  same LWW materialize the engine's direct path uses, yielding the
  consistent downstream state. One scan + one shuffle; log volume is
  bounded by the outage window, not the stream's lifetime.

Log content is the canonical change columns (the sink-input schema), so
the recovered state is byte-comparable with the direct path's replica.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class RedoLog:
    def __init__(self, storage: str, compression: str = "",
                 epoch: int = 0):
        self.storage = storage
        self.row_dir = os.path.join(storage, "row")
        self.meta_path = os.path.join(storage, "meta.json")
        #: consistent.go:56-59 — none|lz4 (parquet codec here)
        self.codec = "lz4" if compression == "lz4" else None
        #: WAL epoch: Spark batch ids restart at 0 whenever the
        #: streaming checkpoint is rebuilt (resume with
        #: overwrite_checkpoint_ts), and a restarted batch=0 must NOT
        #: clobber the original run's batch=0 logs. The changefeed
        #: passes cfg.start_ts as the epoch — 0 for a feed's first life,
        #: the overwrite ts after a rewind — so each checkpoint lineage
        #: writes its own epoch=<n>/batch=<id> namespace while a
        #: replayed batch WITHIN one lineage still overwrites itself.
        #: redo_apply reads every epoch; overlapping rows are identical
        #: by construction and collapse in the LWW materialize.
        self.epoch = int(epoch)
        os.makedirs(self.storage, exist_ok=True)
        #: commit_ts set of already-logged DDL barriers, hydrated ONCE
        #: from ddl.jsonl so log_ddl's append-once check is O(1) instead
        #: of re-reading the file per barrier
        self._ddl_seen: set[int] = {r["commit_ts"] for r in self.ddls()}

    # -- writer side --------------------------------------------------------
    def log_batch(self, batch_df: DataFrame, batch_id: int,
                  hi: int | None = None,
                  lo: int | None = None) -> int | None:
        """WAL one micro-batch, then advance resolved_ts. Must run
        BEFORE the sink applies the batch — the invariant recovery rests
        on is 'nothing is resolved that is not durably logged'. Returns
        the batch's max commit_ts (the caller's checkpoint_ts once the
        sink commits); pass ``hi``/``lo`` if already computed to skip the
        agg.

        resolved_ts advance contract: micro-batches must arrive in
        commit order (the engine's file source scans a commit-ordered
        landing dir, and foreachBatch is sequential) — the reference
        advances resolved only via the flushed-event watermark for the
        same reason. The guard below ENFORCES it: a batch reaching below
        the current resolved_ts that also extends above it is
        out-of-order delivery, not a replay (a replayed batch's rows are
        identical, so its hi never exceeds resolved) — advancing then
        would claim consistency at a ts whose lower rows might still sit
        in an unlogged future batch. Such a batch is logged but resolved
        does NOT advance, and the anomaly is recorded in meta for the
        recovery tooling to surface."""
        w = batch_df.write.mode("overwrite")
        if self.codec:
            w = w.option("compression", self.codec)
        w.parquet(os.path.join(
            self.row_dir, f"epoch={self.epoch}", f"batch={batch_id}"))
        if hi is None or lo is None:
            row = batch_df.agg(F.min("commit_ts"), F.max("commit_ts")).first()
            lo = row[0] if lo is None else lo
            hi = row[1] if hi is None else hi
        if hi is not None:
            resolved = self.meta()["resolved_ts"]
            if lo is not None and lo < resolved and hi > resolved:
                self._update_meta(out_of_order_batch=int(batch_id))
            else:
                self._update_meta(resolved_ts=int(hi))
        return None if hi is None else int(hi)

    def mark_applied(self, batch_id: int, checkpoint_ts: int) -> None:
        """Advance checkpoint_ts after the sink committed the batch —
        clamped to resolved_ts, so the ``checkpoint_ts <= resolved_ts``
        invariant survives an out-of-order batch whose resolved advance
        the guard withheld (the sink may have applied past the frozen
        frontier, but the WAL can only vouch for what is resolved)."""
        m = self.meta()
        self._update_meta(
            checkpoint_ts=min(int(checkpoint_ts), m["resolved_ts"]))

    def log_ddl(self, ddl) -> None:
        """WAL a DDL barrier BEFORE it executes (the
        consistent_replicate_ddl contract: recovery must re-run the
        schema changes, not just the rows). Append-once by commit_ts —
        a replayed barrier is a no-op here like everywhere else."""
        if int(ddl.commit_ts) in self._ddl_seen:
            return
        path = os.path.join(self.storage, "ddl.jsonl")
        rec = {"commit_ts": int(ddl.commit_ts),
               "table_id": ddl.table_id, "query": ddl.query,
               "schema_tag": ddl.schema_tag,
               "schema_name": ddl.schema_name,
               "table_name": ddl.table_name}
        with open(path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        self._ddl_seen.add(rec["commit_ts"])

    def ddls(self) -> list[dict]:
        """The logged DDLs in commit order — the recovering side
        re-executes these against the restored downstream (the redo
        applier's DDL pass)."""
        path = os.path.join(self.storage, "ddl.jsonl")
        if not os.path.exists(path):
            return []
        with open(path) as f:
            recs = [json.loads(ln) for ln in f if ln.strip()]
        return sorted(recs, key=lambda r: r["commit_ts"])

    def _update_meta(self, resolved_ts: int | None = None,
                     checkpoint_ts: int | None = None,
                     out_of_order_batch: int | None = None) -> None:
        m = self.meta()
        if resolved_ts is not None:
            m["resolved_ts"] = max(m["resolved_ts"], resolved_ts)
        if checkpoint_ts is not None:
            m["checkpoint_ts"] = max(m["checkpoint_ts"], checkpoint_ts)
        if out_of_order_batch is not None:
            m.setdefault("out_of_order_batches", [])
            if out_of_order_batch not in m["out_of_order_batches"]:
                m["out_of_order_batches"].append(out_of_order_batch)
        tmp = self.meta_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(m, f)
        os.replace(tmp, self.meta_path)  # atomic swap

    def meta(self) -> dict:
        if not os.path.exists(self.meta_path):
            return {"resolved_ts": 0, "checkpoint_ts": 0}
        with open(self.meta_path) as f:
            return json.load(f)


def redo_apply(spark: SparkSession, storage: str,
               payload_cols: list[str]) -> DataFrame:
    """``cdc redo apply``: reconstruct the consistent downstream state
    from the logs — every logged change with
    ``commit_ts <= meta.resolved_ts`` through the engine's own LWW
    materialize. Returns (table_id, pk, last_commit_ts, op-free payload)."""
    from tigate_spark.operators.apply import materialize

    log = RedoLog(storage)
    m = log.meta()
    rows = spark.read.parquet(log.row_dir)
    rows = rows.filter(F.col("commit_ts") <= m["resolved_ts"])
    return materialize(rows, payload_cols)
