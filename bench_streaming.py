#!/usr/bin/env python
"""Streaming throughput bench: changefeed end-to-end rows/s at 10× sf0.1.

Builds a 1M-change dataset (sf0.1 events replicated 10× with disjoint
event_id ranges so keys/txns stay realistic), then drives the full
Structured Streaming changefeed — source → filter/normalize → sink —
with availableNow over 4 micro-batches, for both sink families:

- ``replica://``   (K1: last-writer-wins merge into partitioned parquet)
- ``changelog://`` (K2: route + canal-json encode + per-topic append)
- ``file://``      (K7: csv encode + dated-tree text write + metadata)

Prints one JSON line per sink. Not driver-run (bench.py is the contract);
this pins the BASELINE.md streaming numbers reproducibly.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from tigate_spark.config import ChangefeedConfig  # noqa: E402
from tigate_spark.session import get_spark  # noqa: E402
from tigate_spark.streaming.changefeed import Changefeed  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPLICAS = 10
N_FILES = 4  # maxFilesPerTrigger=1 → 4 micro-batches


def build_big_source(spark, out_dir: str) -> int:
    ev = spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))
    n = ev.count()
    copies = ev
    for i in range(1, REPLICAS):
        copies = copies.unionByName(
            ev.withColumn("event_id", F.col("event_id") + F.lit(i * n))
        )
    # N_FILES parquet files → N_FILES micro-batches at 1 file/trigger
    copies.repartition(N_FILES).write.mode("overwrite").parquet(out_dir)
    return n * REPLICAS


def run_sink(spark, src_dir: str, sink_uri: str, total_rows: int) -> dict:
    work = tempfile.mkdtemp(prefix=f"tigate-sbench-{sink_uri.split(':')[0]}-")
    try:
        cfg = ChangefeedConfig(changefeed_id="sbench", sink_uri=sink_uri)
        if sink_uri.startswith("file"):
            cfg.sink.protocol = "csv"
        cf = Changefeed(spark, cfg, src_dir, work)
        t0 = time.monotonic()
        cf.run_to_completion(timeout_s=600)
        dt = time.monotonic() - t0
        return {
            "sink": sink_uri,
            "rows": total_rows,
            "sec": round(dt, 2),
            "rows_per_sec": int(total_rows / dt),
            "micro_batches": N_FILES,
        }
    finally:
        shutil.rmtree(work, ignore_errors=True)


def main() -> None:
    spark = get_spark("tigate-streaming-bench")
    big = tempfile.mkdtemp(prefix="tigate-sbench-src-")
    try:
        total = build_big_source(spark, big)
        for uri in ("replica://", "changelog://", "file://out"):
            print(json.dumps(run_sink(spark, big, uri, total)), flush=True)
    finally:
        shutil.rmtree(big, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
