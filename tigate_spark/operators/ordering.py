"""Ordering / time / progress operators T1–T12 (SURVEY §2.2).

tigate gets global order from an LSM whose key is
``(uniqueID, tableID, CRTs, startTs, dmlOrder, key)``
(``logservice/eventstore/format.go:50-85``; delete < update < insert
tie-break at ``:78-85``). In Spark the same total order per key is a
shuffle + ``sortWithinPartitions`` (batch) — no LSM needed because each
micro-batch is bounded (SURVEY §4).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: D < U < I (format.go:78-85)
OP_RANK = {"D": 1, "U": 2, "I": 3}


def op_rank_col(op_col: str = "op") -> Column:
    return (
        F.when(F.col(op_col) == "D", 1)
        .when(F.col(op_col) == "U", 2)
        .otherwise(3)
    )


def sorted_within_table(df: DataFrame, n_partitions: int | None = None) -> DataFrame:
    """T1: cluster by table, order by (commit_ts, start_ts, op_rank, pk).

    At 100 TB this is one shuffle; the sort is spillable and per-partition
    (no global sort / single-reducer bottleneck).
    """
    out = df.withColumn("op_rank", op_rank_col())
    out = out.repartition(*( [n_partitions] if n_partitions else [] ), "table_id")
    return out.sortWithinPartitions("commit_ts", "start_ts", "op_rank", "pk")


def apply_order(df: DataFrame) -> DataFrame:
    """T1/T2: explicit apply sequence per (table_id, pk) — the order a
    same-key consumer must observe (``format.go:50-85``), made testable as
    a ``row_number`` (seq is the unique tie-break)."""
    w = Window.partitionBy("table_id", "pk").orderBy(
        "commit_ts", "start_ts", op_rank_col(), "seq"
    )
    return df.withColumn("apply_seq", F.row_number().over(w))


def range_scan(df: DataFrame, lo: int, hi: int, ts_col: str = "commit_ts") -> DataFrame:
    """T2: ``(lo, hi]`` commit-ts range scan (``event_store.go:602,740-767``).
    Pushed to the parquet scan by Catalyst."""
    return df.filter((F.col(ts_col) > lo) & (F.col(ts_col) <= hi))


def stale_drop(df: DataFrame, resolved_ts: int | Column, ts_col: str = "commit_ts") -> DataFrame:
    """T9: drop events at/below the already-handled resolved ts
    (``downstreamadapter/dispatcher/dispatcher.go:271-279``)."""
    return df.filter(F.col(ts_col) > resolved_ts)


def table_progress(df: DataFrame) -> DataFrame:
    """T11: per-table checkpoint = max committed ts + in-flight row count
    (``downstreamadapter/dispatcher/table_progress.go:24-44``)."""
    return df.groupBy("table_id").agg(
        F.max("commit_ts").alias("checkpoint_ts"),
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("commit_ts", "start_ts").alias("n_txns"),
    )


def changefeed_checkpoint(df: DataFrame) -> DataFrame:
    """T5: two-level watermark aggregation — per-table resolved ts, then
    the changefeed checkpoint = min over tables (partial+final min, as in
    ``maintainer/maintainer.go:74,164-171``). Partial aggregation is
    map-side automatically."""
    per_table = df.groupBy("table_id").agg(F.max("commit_ts").alias("resolved_ts"))
    return per_table.agg(
        F.min("resolved_ts").alias("checkpoint_ts"),
        F.count(F.lit(1)).alias("n_tables"),
    )
