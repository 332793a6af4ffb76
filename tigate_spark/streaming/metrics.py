"""Observability: per-batch changefeed metrics (reference parity:
``metrics/`` Prometheus exporters — changefeed.go, dispatcher.go,
event_store.go gauges/counters — collapsed onto Spark's
StreamingQueryListener progress events).

Metrics land in a JSONL file per changefeed (the Prometheus scrape
equivalent); each record carries the batch id, row counts, durations and
the event-time watermark — enough to rebuild the reference's
changefeed-checkpoint / resolved-ts lag dashboards.
"""

from __future__ import annotations

import json
import os
import threading

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQueryListener


class ChangefeedMetricsListener(StreamingQueryListener):
    """Writes one JSONL record per finished micro-batch."""

    def __init__(self, out_path: str):
        self.out_path = out_path
        os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
        self._lock = threading.Lock()

    def onQueryStarted(self, event) -> None:
        self._write({"event": "started", "id": str(event.id),
                     "name": event.name})

    def onQueryProgress(self, event) -> None:
        p = event.progress
        self._write({
            "event": "progress",
            "name": p.name,
            "batch_id": p.batchId,
            "num_input_rows": p.numInputRows,
            "processed_rows_per_second": p.processedRowsPerSecond,
            "duration_ms": p.durationMs,
            "watermark": p.eventTime.get("watermark") if p.eventTime else None,
            "state_rows": (p.stateOperators[0].numRowsTotal
                           if p.stateOperators else None),
        })

    def onQueryTerminated(self, event) -> None:
        self._write({"event": "terminated", "id": str(event.id),
                     "exception": event.exception})

    def onQueryIdle(self, event) -> None:
        # Intentionally empty: idle ticks fire every availableNow poll
        # with no progress payload — logging them would flood the ledger
        # with zero-information rows. The progress/terminated events
        # above carry the full picture.
        pass

    def _write(self, rec: dict) -> None:
        with self._lock:
            with open(self.out_path, "a") as f:
                f.write(json.dumps(rec) + "\n")


def attach_metrics(spark: SparkSession, out_path: str) -> ChangefeedMetricsListener:
    listener = ChangefeedMetricsListener(out_path)
    spark.streams.addListener(listener)
    return listener


def detach_metrics(spark: SparkSession, listener: ChangefeedMetricsListener) -> None:
    spark.streams.removeListener(listener)
