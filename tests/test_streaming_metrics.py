"""Metrics listener test — per-batch progress records (observability)."""

from __future__ import annotations

import json
import os
import time

from tigate_spark.config import ChangefeedConfig
from tigate_spark.streaming.changefeed import Changefeed
from tigate_spark.streaming.metrics import attach_metrics, detach_metrics


def test_metrics_jsonl_per_batch(spark, sf_dir, tmp_path):
    out = str(tmp_path / "metrics.jsonl")
    listener = attach_metrics(spark, out)
    try:
        cfg = ChangefeedConfig(changefeed_id="cf-metrics", sink_uri="noop://")
        cf = Changefeed(spark, cfg, os.path.join(sf_dir, "events.parquet"),
                        str(tmp_path))
        cf.run_to_completion()
        # listener callbacks are async — give the bus a moment
        deadline = time.time() + 30
        recs = []
        while time.time() < deadline:
            if os.path.exists(out):
                recs = [json.loads(line) for line in open(out)]
                if any(r["event"] == "terminated" for r in recs):
                    break
            time.sleep(0.5)
    finally:
        detach_metrics(spark, listener)
    events = [r["event"] for r in recs]
    assert "started" in events and "terminated" in events
    progress = [r for r in recs if r["event"] == "progress"
                and r.get("name") == "cf-metrics" and r["num_input_rows"] > 0]
    assert len(progress) >= 1
    n = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).count()
    assert progress[0]["num_input_rows"] == n
    assert progress[0]["processed_rows_per_second"] > 0
