"""Partition-table routing: physical partition IDs → logical tables.

Reference parity: a partitioned TiDB table is N physical tables — every
``DMLEvent`` carries ``PhysicalTableID`` (``pkg/common/event/
dml_event.go:20-61``), which for a partition differs from the logical
table the sink must write (``partition_table/run.sh`` pins N-partition
fan-in into ONE downstream table; ``csv_storage_partition_table/``,
``consistent_partition_table/`` pin the same for storage/redo lanes).
``EXCHANGE PARTITION`` swaps a partition's physical id with a standalone
table's id (``logservice/schemastore/persist_storage.go:877-885,
1391-1405``: exactly one dropped partition; both stores get the DDL), so
the mapping is VERSIONED by ddl commit-ts.

Spark-first shape: the mapping is a dimension-sized registry —
``(physical_table_id, valid_from_ts) → (table_id, schema_name,
table_name)`` — closed into half-open validity intervals with one
window over the REGISTRY alone (dim-sized, never the event stream) and
broadcast-joined to events. One broadcast hash join, zero event-side
shuffle, no per-event aggregation: the shape that survives 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: open upper bound for the newest mapping version (beyond any TSO)
PART_MAX_TS = 1 << 62

_REG_SCHEMA = ("physical_table_id long, valid_from_ts long, "
               "table_id long, schema_name string, table_name string")


def partition_registry(spark: SparkSession,
                       rows: list[tuple]) -> DataFrame:
    """Versioned physical→logical mapping. ``rows`` =
    ``(physical_table_id, valid_from_ts, table_id, schema_name,
    table_name)``; successive versions of one physical id close each
    other's validity interval (``multi_version.go:35-52``'s
    largest-version-≤-ts lookup, materialized as intervals so event
    resolution is a single join predicate instead of a per-event
    max-version aggregation)."""
    from pyspark.sql import Window

    df = spark.createDataFrame(rows, _REG_SCHEMA)
    w = Window.partitionBy("physical_table_id").orderBy("valid_from_ts")
    return df.withColumn(
        "valid_to_ts",
        F.coalesce(F.lead("valid_from_ts").over(w), F.lit(PART_MAX_TS)))


def exchange_partition(rows: list[tuple], at_ts: int,
                       partition_physical_id: int,
                       table_physical_id: int) -> list[tuple]:
    """Append the two mapping versions an ``EXCHANGE PARTITION`` commits
    at ``at_ts``: the partition's physical id takes the standalone
    table's logical identity and vice versa (``persist_storage.go:
    877-885`` — the swapped-out partition id becomes the standalone
    table; the standalone table's old id becomes the partition).
    Returns ``rows`` plus the two new versions."""

    def latest(pid: int) -> tuple:
        cands = [r for r in rows if r[0] == pid and r[1] <= at_ts]
        if not cands:
            raise ValueError(f"physical id {pid} unmapped at ts {at_ts}")
        return max(cands, key=lambda r: r[1])

    part = latest(partition_physical_id)
    tbl = latest(table_physical_id)
    return list(rows) + [
        (partition_physical_id, at_ts, tbl[2], tbl[3], tbl[4]),
        (table_physical_id, at_ts, part[2], part[3], part[4]),
    ]


def resolve_logical(events: DataFrame, registry: DataFrame,
                    physical_col: str = "physical_table_id") -> DataFrame:
    """Route change events to their LOGICAL table: replace
    ``table_id``/``schema_name``/``table_name`` with the registry
    mapping in effect at each event's ``commit_ts``. Physical ids absent
    from the registry pass through unchanged (non-partitioned tables
    keep ``physical_table_id == table_id``). Broadcast interval join —
    the registry is partition-count-sized, so the event stream never
    shuffles here."""
    passthrough = [c for c in events.columns
                   if c not in ("schema_name", "table_name", "table_id")]
    r = registry.select(
        F.col("physical_table_id").alias("_r_pid"),
        F.col("valid_from_ts").alias("_r_from"),
        F.col("valid_to_ts").alias("_r_to"),
        F.col("table_id").alias("_r_tid"),
        F.col("schema_name").alias("_r_schema"),
        F.col("table_name").alias("_r_table"))
    joined = events.join(
        F.broadcast(r),
        (events[physical_col] == r["_r_pid"])
        & (r["_r_from"] <= events["commit_ts"])
        & (events["commit_ts"] < r["_r_to"]),
        "left")
    return joined.select(
        F.coalesce(F.col("_r_schema"), F.col("schema_name"))
        .alias("schema_name"),
        F.coalesce(F.col("_r_table"), F.col("table_name"))
        .alias("table_name"),
        F.coalesce(F.col("_r_tid"), F.col("table_id")).alias("table_id"),
        *passthrough)
