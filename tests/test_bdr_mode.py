"""BDR (bidirectional replication) mode — reference parity tests.

The reference's BDR story (``pkg/config/replica_config.go:148`` bdr-mode;
``pkg/sink/mysql/helper.go:334-343`` SetWriteSource; ``logservice/
schemastore/persist_storage.go:808`` BDRRole on DDL events): every CDC
write is tagged with a nonzero source id so the OTHER direction's
changefeed can skip it (loop prevention), and only PRIMARY-role DDLs
replicate (the secondary's DDLs arrive via the primary's stream).
"""

from __future__ import annotations

import os
import sqlite3

import pytest
from pyspark.sql import functions as F

from tigate_spark.config import ChangefeedConfig
from tigate_spark.operators.apply import materialize
from tigate_spark.sources.changes import changes_stream, normalize_events
from tigate_spark.streaming.changefeed import PAYLOAD_COLS, Changefeed
from tigate_spark.streaming.ddl import DDLEvent
from tigate_spark.streaming.sinks import read_replica

#: heavy streaming/e2e tail — excluded from the fast path
#: (`pytest -m "not slow"`); the close gate runs everything
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def tagged_source(spark, sf_dir, tmp_path_factory):
    """events with a write-source column: even event_ids pretend to be
    rows another CDC applied (source 7), odd ones are app writes (0)."""
    src = str(tmp_path_factory.mktemp("bdr_src"))
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    ev.withColumn(
        "_source_id",
        F.when(F.col("event_id") % 2 == 0, F.lit(7)).otherwise(F.lit(0)),
    ).coalesce(1).write.mode("overwrite").parquet(src)
    return src


def _replica(spark, tmp_path, tagged_source, cid, bdr):
    cfg = ChangefeedConfig(changefeed_id=cid, sink_uri="replica://",
                           bdr_mode=bdr)
    cf = Changefeed(spark, cfg, tagged_source, str(tmp_path / cid))
    cf.run_to_completion()
    return read_replica(spark, cf.sink.state_dir).select(
        "table_id", "pk", "commit_ts", *PAYLOAD_COLS)


def test_bdr_mode_replicates_only_app_writes(spark, sf_dir, tmp_path,
                                             tagged_source):
    """bdr_mode drops CDC-sourced rows (loop prevention); the control
    feed without it replicates everything — the loop it would cause."""
    bdr = _replica(spark, tmp_path, tagged_source, "bdr-on", True)
    raw = spark.read.parquet(tagged_source)
    exp = materialize(
        normalize_events(raw.filter(F.col("_source_id") == 0)),
        PAYLOAD_COLS,
    ).select("table_id", "pk",
             F.col("last_commit_ts").alias("commit_ts"), *PAYLOAD_COLS)
    assert bdr.count() == exp.count() > 0
    assert bdr.exceptAll(exp).count() == 0
    assert exp.exceptAll(bdr).count() == 0

    ctl = _replica(spark, tmp_path, tagged_source, "bdr-off", False)
    all_exp = materialize(normalize_events(raw), PAYLOAD_COLS)
    assert ctl.count() == all_exp.count() > exp.count()


def test_bdr_ddl_role_gating(spark, sf_dir, tmp_path, tagged_source):
    """Only primary-role DDLs replicate in BDR mode; without it every
    configured DDL applies (role is ignored outside BDR)."""
    ch = changes_stream(spark, sf_dir)
    lo, hi = ch.agg(F.min("commit_ts"), F.max("commit_ts")).first()
    ddls = [
        DDLEvent(commit_ts=lo + (hi - lo) // 3, table_id=1,
                 query="ALTER TABLE t1 ADD COLUMN a INT",
                 schema_tag="v1", bdr_role="primary"),
        DDLEvent(commit_ts=lo + 2 * (hi - lo) // 3, table_id=2,
                 query="ALTER TABLE t2 ADD COLUMN b INT",
                 schema_tag="v2", bdr_role="secondary"),
    ]

    def run(cid, bdr):
        cfg = ChangefeedConfig(changefeed_id=cid, sink_uri="noop://",
                               bdr_mode=bdr)
        cf = Changefeed(spark, cfg, tagged_source, str(tmp_path / cid),
                        ddl_events=ddls)
        cf.run_to_completion()
        return cf.registry.versions(spark)

    reg = run("bdr-ddl-on", True)
    assert [r["schema_tag"] for r in reg.collect()] == ["v1"]
    reg = run("bdr-ddl-off", False)
    assert {r["schema_tag"] for r in reg.collect()} == {"v1", "v2"}


def test_write_source_recorded_on_lanes(spark, sf_dir, tmp_path,
                                        tagged_source):
    """The executable sink tags every lane DB with the feed's source id
    (the SET SESSION tidb_cdc_write_source twin) — the hook a read-back
    capture uses to tag its changes nonzero."""
    cfg = ChangefeedConfig(changefeed_id="bdr-tag", sink_uri="sqlite://",
                           source_id=7)
    cf = Changefeed(spark, cfg, tagged_source, str(tmp_path / "bdr-tag"))
    cf.run_to_completion()
    lanes = [f for f in os.listdir(cf.sink.db_dir) if f.endswith(".db")]
    assert lanes
    for f in lanes:
        con = sqlite3.connect(os.path.join(cf.sink.db_dir, f))
        src = list(con.execute("SELECT source_id FROM _write_source"))
        con.close()
        assert src == [(7,)]


def test_bdr_mode_rejects_roleless_ddl(spark, tmp_path, tagged_source):
    """A role-less DDLEvent under bdr_mode is a misconfiguration that
    must fail loudly at create time — silently dropping it would leave
    the downstream schema un-evolved with a clean run."""
    cfg = ChangefeedConfig(changefeed_id="bdr-bad", sink_uri="noop://",
                           bdr_mode=True)
    with pytest.raises(ValueError, match="bdr_role"):
        Changefeed(spark, cfg, tagged_source, str(tmp_path / "bdr-bad"),
                   ddl_events=[DDLEvent(commit_ts=1, table_id=1,
                                        query="ALTER TABLE t1 ADD x INT",
                                        schema_tag="v1")])
