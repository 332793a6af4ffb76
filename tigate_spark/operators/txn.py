"""Transaction grouping + syncpoint operators (T6, T7 — SURVEY §2.2).

Reference parity:
- T6 txn grouping  ``pkg/eventservice/event_broker.go:489-502``;
  ``pkg/common/event/dml_event.go:84-108`` (rows sharing (startTs,
  commitTs) form one DMLEvent).
- T7 sync point    ``downstreamadapter/syncpoint/syncpoint.go:15-22``
  (ts alignment), emit ``event_broker.go:380-394``, ts-map table
  ``pkg/sink/mysql/mysql_writer.go:154-200,530-540``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def txn_group(df: DataFrame) -> DataFrame:
    """T6: one row per transaction per table, with size + op mix.

    Map-side partial aggregation handles skew; at 100 TB the groupBy keys
    (table_id, start_ts, commit_ts) are near-unique so combiners are cheap.
    """
    return df.groupBy("table_id", "start_ts", "commit_ts").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("op") == "I", 1).otherwise(0)).alias("n_insert"),
        F.sum(F.when(F.col("op") == "U", 1).otherwise(0)).alias("n_update"),
        F.sum(F.when(F.col("op") == "D", 1).otherwise(0)).alias("n_delete"),
        F.min("seq").alias("first_seq"),
        F.sum("value_cents").alias("txn_value_cents"),
    )


def syncpoint_ticks(df: DataFrame, interval_us: int) -> DataFrame:
    """T7: aligned tumbling ticks — the ``syncpoint_v1``
    (primary_ts, secondary_ts) map (``mysql_writer.go:528-542``).

    ``primary_ts`` is the upstream max commit covered by the tick;
    ``secondary_ts`` is the downstream applied position when the tick is
    written (``mysql_writer.go:154-185`` reads ``@@tidb_current_ts``) —
    in a totally-ordered replay that is the running max of applied commit
    ts, so it is monotone across ticks by construction.

    Alignment mirrors CalculateStartSyncPointTs (``syncpoint.go:15-22``):
    tick k covers ``[k*interval, (k+1)*interval)``.
    """
    from pyspark.sql import Window

    bucket = (F.col("commit_ts") - F.col("commit_ts") % interval_us).alias("sync_point_ts")
    ticks = df.groupBy(bucket).agg(
        F.max("commit_ts").alias("primary_ts"),
        F.count(F.lit(1)).alias("n_events"),
    )
    applied = Window.orderBy("sync_point_ts").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return ticks.withColumn("secondary_ts", F.max("primary_ts").over(applied))


def match_prewrite_commit(prewrites: DataFrame, commits: DataFrame) -> DataFrame:
    """S2: the transaction matcher — join prewrite values with commit
    timestamps per ``(start_ts, key)``; prewrites with no commit (rollback
    or still-pending) drop out (``logservice/logpuller/txn_matcher.go:42-110``).

    Batch form is an inner join; the streaming form is the same join as a
    stream-stream join with watermarks bounding the prewrite retention
    (tigate caches unmatched prewrites exactly the same way).
    """
    p = prewrites.select(
        F.col("start_ts").alias("p_start_ts"), F.col("pk").alias("p_pk"),
        "value_cents", "event_type", "seq",
    )
    c = commits.select("start_ts", "pk", "commit_ts")
    return (
        c.join(p, (F.col("start_ts") == F.col("p_start_ts")) & (F.col("pk") == F.col("p_pk")))
        .select("start_ts", "pk", "commit_ts", "value_cents", "event_type", "seq")
    )


def match_prewrite_commit_streams(
    prewrites: DataFrame, commits: DataFrame,
    retention: str = "10 minutes", late: str = "10 seconds",
) -> DataFrame:
    """S2, streaming form: the txn matcher as a Structured Streaming
    stream-stream inner join on ``(start_ts, key)``.

    The reference caches unmatched prewrites per key until the commit (or a
    rollback) arrives (``logservice/logpuller/txn_matcher.go:42-110``);
    here the watermark + time-range bound does the same job — a prewrite
    is retained in join state for at most ``retention`` of event time, then
    evicted (the rollback/no-commit path). Both inputs need an event-time
    column: ``p_time`` (prewrite, from start_ts) and ``c_time`` (commit,
    from commit_ts); commitTs > startTs always holds upstream, so the
    range condition is one-sided plus the retention cap.
    """
    p = prewrites.select(
        F.col("start_ts").alias("p_start_ts"), F.col("pk").alias("p_pk"),
        "value_cents", "event_type", "seq", "p_time",
    ).withWatermark("p_time", late)
    c = commits.select("start_ts", "pk", "commit_ts", "c_time").withWatermark(
        "c_time", late
    )
    return (
        c.join(
            p,
            (F.col("start_ts") == F.col("p_start_ts"))
            & (F.col("pk") == F.col("p_pk"))
            & (F.col("c_time") >= F.col("p_time"))
            & (F.col("c_time") <= F.col("p_time") + F.expr(f"INTERVAL {retention}")),
        )
        .select("start_ts", "pk", "commit_ts", "value_cents", "event_type", "seq")
    )


#: scaled-down MaxTxnRow (reference default 256, ``pkg/sink/mysql/
#: config.go:39-51``) so small-SF corpora still produce multiple flush
#: batches per lane
FLUSH_MAX_ROWS = 64
#: worker-lane count (the reference's MySQL DML worker pool size)
FLUSH_LANES = 4


def flush_batches(txns: DataFrame, max_rows: int = FLUSH_MAX_ROWS,
                  n_lanes: int = FLUSH_LANES) -> DataFrame:
    """K1 worker flush batching — the accumulate-until-over-threshold loop
    of the reference's MySQL DML worker
    (``downstreamadapter/worker/mysql_worker.go:90-135``: rows +=
    event.Len(); rows > MaxTxnRow -> Flush, the crossing txn INCLUDED)
    plus the per-flush accounting ``prepareDMLs`` keeps
    (``pkg/sink/mysql/mysql_writer.go:670-726``: rowCount, startTs set).

    Each batch is the minimal txn-run whose row sum EXCEEDS ``max_rows``
    (the final batch per lane may be smaller). Lanes are the reference's
    parallelism unit — a worker consumes its event channel sequentially,
    so per-lane sequential processing is the semantics, not a
    compromise: ``applyInPandas`` groups by lane and runs the greedy
    walk per lane, giving exactly n_lanes-way parallelism at any scale
    (in production n_lanes = worker-count config, hundreds). Input must
    carry (table_id, start_ts, commit_ts, n_rows); ordering inside a
    lane is (commit_ts, start_ts, table_id) — the commit-order the
    dispatcher feeds workers.
    """
    import pandas as pd
    from pyspark.sql.types import LongType, StructField, StructType

    schema = StructType([
        StructField("lane", LongType()),
        StructField("batch_seq", LongType()),
        StructField("n_txns", LongType()),
        StructField("n_rows", LongType()),
        StructField("first_commit_ts", LongType()),
        StructField("last_commit_ts", LongType()),
        StructField("n_start_ts", LongType()),
    ])

    def walk(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["commit_ts", "start_ts", "table_id"])
        lane = int(pdf["lane"].iloc[0])
        out = []
        seq, cum, ntxn, first, last, sts = 1, 0, 0, 0, 0, set()
        for commit_ts, start_ts, nr in zip(
            pdf["commit_ts"], pdf["start_ts"], pdf["n_rows"]
        ):
            if ntxn == 0:
                first = int(commit_ts)
            cum += int(nr)
            ntxn += 1
            last = int(commit_ts)
            sts.add(int(start_ts))
            if cum > max_rows:
                out.append((lane, seq, ntxn, cum, first, last, len(sts)))
                seq, cum, ntxn, sts = seq + 1, 0, 0, set()
        if ntxn:
            out.append((lane, seq, ntxn, cum, first, last, len(sts)))
        return pd.DataFrame(out, columns=[f.name for f in schema.fields])

    lanes = txns.withColumn(
        "lane", (F.col("table_id") % F.lit(n_lanes)).cast("bigint")
    ).select("lane", "table_id", "start_ts", "commit_ts", "n_rows")
    return lanes.groupBy("lane").applyInPandas(walk, schema)
