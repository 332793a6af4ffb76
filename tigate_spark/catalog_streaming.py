"""Streaming-path catalog entries: the Structured Streaming changefeed run
end-to-end inside a `queries()` builder, oracle-checked like every batch
operator.

The builder executes a real ``readStream → foreachBatch`` query
(availableNow) into a temp replica dir, then returns the replica as a
DataFrame — so the driver's hash-match proves the *streaming* engine
produces the same final state as the DuckDB last-writer-wins oracle
(`sync_diff_inspector` equivalence, SURVEY §5).
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tigate_spark.catalog import register
from tigate_spark.config import ChangefeedConfig
from tigate_spark.sources.changes import ORACLE_CHANGES_CTE

_STREAM_ORACLE = ORACLE_CHANGES_CTE + """
, ordered AS (
  SELECT *, row_number() OVER (
    PARTITION BY table_id, pk
    ORDER BY commit_ts DESC, start_ts DESC,
             CASE op WHEN 'D' THEN 1 WHEN 'U' THEN 2 ELSE 3 END DESC, seq DESC
  ) AS rn
  FROM changes
)
SELECT table_id, pk, commit_ts AS last_commit_ts, event_type, value_cents
FROM ordered WHERE rn = 1 AND op <> 'D'
"""


@register(
    "streaming_replica_e2e",
    _STREAM_ORACLE,
    doc="Structured Streaming changefeed (readStream → foreachBatch merge) "
        "materializing the replica; checkpointed, availableNow "
        "(SURVEY §3.2; mysql sink K1 + T5/T11 bookkeeping)",
)
def streaming_replica_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tigate_spark.streaming.changefeed import Changefeed
    from tigate_spark.streaming.sinks import read_replica

    work = tempfile.mkdtemp(prefix="tigate-stream-")
    try:
        cfg = ChangefeedConfig(changefeed_id="e2e", sink_uri="replica://")
        cf = Changefeed(
            spark, cfg, os.path.join(sf_dir, "events.parquet"), work
        )
        cf.run_to_completion()
        replica = read_replica(spark, cf.sink.state_dir).select(
            "table_id", "pk", F.col("commit_ts").alias("last_commit_ts"),
            "event_type", "value_cents",
        )
        # materialize before the temp dir disappears
        out = spark.createDataFrame(replica.collect(), replica.schema)
        return out
    finally:
        shutil.rmtree(work, ignore_errors=True)
