"""Round-10 regression tests for the advisor's findings: update()
preserving DDL barriers, root-cause-only unretryable matching, the
large-message-handle 'none'/protocol matrix, the redo resolved_ts
out-of-order guard + O(1) DDL dedup, and NULL after-images in the
widened safe-mode args vector."""

from __future__ import annotations

import builtins
import json
import os

import pytest

from tigate_spark.config import ChangefeedConfig
from tigate_spark.engine import Engine, _is_unretryable
from tigate_spark.streaming.ddl import DDLEvent
from tigate_spark.streaming.redo import RedoLog


# -- Engine.update keeps configured DDL barriers ---------------------------

def test_update_preserves_ddl_events(spark, sf_dir, tmp_path):
    """PUT .../{id} with no DDL mention must not silently drop the
    feed's configured barriers (the downstream schema would never
    evolve while run_to_completion finishes clean)."""
    ddl = DDLEvent(commit_ts=123, table_id=1,
                   query="ALTER TABLE `app`.`t1` ADD COLUMN `x` BIGINT",
                   schema_tag="v2", schema_name="app", table_name="t1")
    eng = Engine(spark, os.path.join(sf_dir, "events.parquet"),
                 str(tmp_path))
    cid = eng.create(
        ChangefeedConfig(changefeed_id="cf-upd", sink_uri="replica://"),
        ddl_events=[ddl])
    eng.update(cid, ChangefeedConfig(changefeed_id="cf-upd",
                                     sink_uri="replica://"))
    assert eng.changefeed(cid).ddl_events == [ddl]
    # explicit override still wins, and None clears
    ddl2 = DDLEvent(commit_ts=456, table_id=2, query="DROP INDEX `i`",
                    schema_tag="v3", schema_name="app", table_name="t2")
    eng.update(cid, ChangefeedConfig(changefeed_id="cf-upd",
                                     sink_uri="replica://"),
               ddl_events=[ddl2])
    assert eng.changefeed(cid).ddl_events == [ddl2]
    eng.update(cid, ChangefeedConfig(changefeed_id="cf-upd",
                                     sink_uri="replica://"),
               ddl_events=None)
    assert eng.changefeed(cid).ddl_events == []


# -- unretryable classification: root cause only ---------------------------

def test_unretryable_matches_root_cause_not_embedded_traceback():
    # a transient JVM failure whose EMBEDDED traceback text happens to
    # contain a broad fragment must stay retryable
    transient = RuntimeError(
        "Query terminated with exception\n"
        "  File \"foo.py\", line 10, in bar\n"
        "    # the value must be recomputed after refresh\n"
        "py4j.protocol.Py4JJavaError: An error occurred\n"
        "Caused by: java.io.FileNotFoundException: part-0000 "
        "It is possible the underlying files have been updated.\n")
    assert not _is_unretryable(transient)
    # ...but a genuine config error in the ROOT-CAUSE line fast-fails
    config = RuntimeError(
        "Query terminated with exception\n"
        "Caused by: java.lang.RuntimeException: boom\n"
        "ValueError: invalid partition-num='0' in sink-uri\n")
    assert _is_unretryable(config)
    # the sentinel class name is matched anywhere in the chain
    sentinel = RuntimeError(
        "wrapped\ntigate_spark.engine.ChangefeedUnretryableError: bad\n"
        "  during handling, another exception occurred")
    assert _is_unretryable(sentinel)


# -- large-message-handle validation matrix --------------------------------

@pytest.mark.parametrize("handle,protocol,ok", [
    ("none", "csv", True),            # 'none' = disabled, any protocol
    ("", "avro", True),
    (None, "avro", True),
    ("handle-key-only", "simple", True),   # ProtocolSimple is permitted
    ("claim-check", "open-protocol", True),
    ("handle-key-only", "canal-json", True),
    ("claim-check", "avro", False),  # no message column to operate on
    ("handle-key-only", "csv", False),
])
def test_large_message_handle_protocol_matrix(spark, sf_dir, tmp_path,
                                              handle, protocol, ok):
    from tigate_spark.config import SinkConfig
    from tigate_spark.streaming.changefeed import Changefeed

    cfg = ChangefeedConfig(
        changefeed_id=f"cf-lmh-{protocol}-{handle or 'off'}",
        sink_uri="noop://",
        sink=SinkConfig(protocol=protocol, large_message_handle=handle),
    )
    src = os.path.join(sf_dir, "events.parquet")
    if ok:
        Changefeed(spark, cfg, src, str(tmp_path))
    else:
        with pytest.raises(ValueError, match="not supported"):
            Changefeed(spark, cfg, src, str(tmp_path))


# -- redo: resolved_ts out-of-order guard ----------------------------------

def _df(spark, ts_list):
    return spark.createDataFrame(
        [(int(t), i) for i, t in enumerate(ts_list)],
        "commit_ts bigint, pk bigint")


def test_redo_resolved_ts_out_of_order_guard(spark, tmp_path):
    log = RedoLog(str(tmp_path / "redo"))
    log.log_batch(_df(spark, [10, 15, 20]), 0)
    assert log.meta()["resolved_ts"] == 20
    # a pure replay (identical range, hi <= resolved) keeps resolved
    log.log_batch(_df(spark, [10, 15, 20]), 0)
    assert log.meta()["resolved_ts"] == 20
    assert "out_of_order_batches" not in log.meta()
    # out-of-order delivery: reaches BELOW resolved and ABOVE it —
    # logged, but resolved must NOT advance (rows <= 25 may still sit in
    # an unlogged future batch) and the anomaly is recorded
    log.log_batch(_df(spark, [5, 25]), 1)
    m = log.meta()
    assert m["resolved_ts"] == 20
    assert m["out_of_order_batches"] == [1]
    # a following in-order batch advances normally
    log.log_batch(_df(spark, [30, 40]), 2)
    assert log.meta()["resolved_ts"] == 40


def test_redo_log_ddl_single_hydration_read(tmp_path, monkeypatch):
    """log_ddl dedups via the in-memory seen-set: ddl.jsonl is read
    ONCE per RedoLog life (at construction), not once per barrier."""
    storage = str(tmp_path / "redo")
    ddls = [DDLEvent(commit_ts=t, table_id=1, query=f"DDL {t}",
                     schema_tag=f"v{t}", schema_name="app",
                     table_name="t1") for t in (1, 2, 3)]
    log = RedoLog(storage)
    path = os.path.join(storage, "ddl.jsonl")
    real_open = builtins.open
    reads = []

    def counting_open(file, mode="r", *a, **kw):
        if os.fspath(file) == path and "r" in mode and "+" not in mode:
            reads.append(mode)
        return real_open(file, mode, *a, **kw)

    monkeypatch.setattr(builtins, "open", counting_open)
    for d in ddls + ddls:  # replays included
        log.log_ddl(d)
    monkeypatch.setattr(builtins, "open", real_open)
    assert reads == []  # hydrated before patching; appends never re-read
    assert [r["commit_ts"] for r in log.ddls()] == [1, 2, 3]
    # a SECOND life hydrates once and still dedups
    log2 = RedoLog(storage)
    for d in ddls:
        log2.log_ddl(d)
    assert [r["commit_ts"] for r in log2.ddls()] == [1, 2, 3]


# -- widened safe-mode args: NULL after-image renders as JSON null ----------

def test_widened_args_null_extra_renders_json_null(spark, sf_dir):
    from tigate_spark.sources.changes import changes_stream
    from tigate_spark.streaming.sqlite_apply import (
        render_safe_mode_statements,
    )

    ch = changes_stream(spark, sf_dir).limit(50)
    tables = [r[0] for r in ch.select("table_id").distinct().collect()]
    stmts = render_safe_mode_statements(
        ch, extra_tables=frozenset(tables),
        extra_expr="cast(null as bigint)")
    wide = [r for r in stmts.collect() if "extra_cents" in r["sql"]]
    assert wide, "expected widened REPLACE statements"
    for r in wide:
        args = json.loads(r["args"])  # must parse — not a NULL vector
        assert args[-1] is None
