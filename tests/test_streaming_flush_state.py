"""Cross-restart state recovery for the streaming flush-batch operator:
GroupState (the open batch's cum/seq/startTs set) must survive a query
stop/restart on the same checkpoint, so a flush batch SPANNING the
restart boundary closes with the right counts and batch_seq continuity —
the streamed result equals the batch operator's regardless of where the
stream was interrupted."""

from __future__ import annotations

import pytest

#: heavy streaming/e2e tail — excluded from the fast path
pytestmark = pytest.mark.slow

import glob
import os
import time

import pyspark.sql.functions as F

from tigate_spark.operators.txn import flush_batches
from tigate_spark.streaming.stateful import flush_batch_accounting


def _run(spark, schema, src_dir, out_dir, ckpt):
    raw = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("pathGlobFilter", "*.parquet")
        .parquet(src_dir)
    )
    q = (
        flush_batch_accounting(raw, max_rows=25)
        .writeStream.format("parquet")
        .option("path", out_dir).option("checkpointLocation", ckpt)
        .trigger(availableNow=True).start()
    )
    assert q.awaitTermination(120), "query still running at timeout"
    assert q.exception() is None


def test_flush_state_survives_restart(spark, tmp_path):
    # variable-size txns on one lane; max_rows=25 guarantees open batches
    # at arbitrary cut points
    rows = [(0, 10 + i, 100 + i, (i * 7) % 23 + 1) for i in range(40)]
    df = spark.createDataFrame(
        rows, "table_id long, start_ts long, commit_ts long, n_rows long"
    )
    want = sorted(
        map(tuple, flush_batches(df, max_rows=25, n_lanes=1).collect())
    )

    lanes = df.selectExpr(
        "cast(0 as long) lane", "table_id", "start_ts", "commit_ts", "n_rows"
    )
    # three commit-ordered thirds + the sentinel (delay-timer flush)
    ranked = lanes.withColumn(
        "part",
        F.expr("least(cast((row_number() over (order by commit_ts) - 1) "
               "div 14 as int), 2)"),
    )
    parts_dir = str(tmp_path / "parts")
    ranked.write.partitionBy("part").parquet(parts_dir)
    sent = lanes.limit(1).selectExpr(
        "cast(0 as long) lane", "cast(-1 as long) table_id",
        "cast(-1 as long) start_ts", "cast(1000 as long) commit_ts",
        "cast(0 as long) n_rows")
    sent_dir = str(tmp_path / "sent")
    sent.coalesce(1).write.parquet(sent_dir)

    src = str(tmp_path / "src")
    os.makedirs(src)
    now = time.time()

    def land(tag, pattern, mtime):
        for j, f in enumerate(sorted(glob.glob(pattern))):
            dst = os.path.join(src, f"{tag}-{j}.parquet")
            os.link(f, dst)
            os.utime(dst, (mtime, mtime))

    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ck")
    # run 1: only the first two thirds — batches are mid-flight when the
    # query stops (25-row threshold does not align with the file split)
    land("00", os.path.join(parts_dir, "part=0", "*.parquet"), now)
    land("01", os.path.join(parts_dir, "part=1", "*.parquet"), now + 1)
    _run(spark, sent.schema, src, out_dir, ckpt)
    partial = spark.read.parquet(out_dir).count()
    assert partial < len(want), "restart point must leave an open batch"

    # run 2: remaining third + sentinel, SAME checkpoint — carried
    # GroupState must finish the open batch and keep batch_seq continuous
    land("02", os.path.join(parts_dir, "part=2", "*.parquet"), now + 2)
    land("99", os.path.join(sent_dir, "*.parquet"), now + 3)
    _run(spark, sent.schema, src, out_dir, ckpt)

    got = sorted(map(tuple, spark.read.parquet(out_dir).collect()))
    assert got == want
