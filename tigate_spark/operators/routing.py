"""Routing / partitioning operators R1–R8 (SURVEY §2.5).

These compute the sink routing columns (``topic``, ``partition``); physical
redistribution is then a plain ``repartition`` on those columns — Spark's
shuffle replaces tigate's dispatcher fan-out.

Reference parity:
- R1 event router      ``eventrouter/event_router.go:27-66,78-137``
- R2 topic expression  ``eventrouter/topic/expression.go:47-94``
- R3 partition: table  ``eventrouter/partition/table.go``
- R4 partition: ts     ``eventrouter/partition/ts.go``
- R5 partition: index-value ``eventrouter/partition/index_value.go:43-100``
- R6 partition: columns     ``eventrouter/partition/columns.go:30-90``
- R7 partition: key    ``eventrouter/partition/key.go``
- R8 MySQL worker lanes ``downstreamadapter/sink/mysql_sink.go:143-149``
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tigate_spark.config import DispatchRule
from tigate_spark.functions.phash import h32
from tigate_spark.operators.filters import _matcher_cond


def topic_expr(template: str,
               schema_col: str = "schema_name", table_col: str = "table_name") -> Column:
    """R2: render ``[prefix]{schema}[mid][{table}][suffix]`` templates."""
    fmt = template.replace("%", "%%").replace("{schema}", "%s").replace("{table}", "%s")
    args = []
    if "{schema}" in template:
        args.append(F.col(schema_col))
    if "{table}" in template:
        args.append(F.col(table_col))
    # preserve original placeholder order
    order = sorted(
        [(template.find("{schema}"), F.col(schema_col)), (template.find("{table}"), F.col(table_col))],
        key=lambda t: t[0],
    )
    args = [c for pos, c in order if pos >= 0]
    return F.format_string(fmt, *args)


def partition_by_table(n: int) -> Column:
    """R3: stable per-table partition — hash(schema.table) % n."""
    return h32(F.concat_ws(".", F.col("schema_name"), F.col("table_name"))) % n


def partition_by_ts(n: int) -> Column:
    """R4: commit_ts % n (balance over order)."""
    return F.col("commit_ts") % n


def partition_by_index_value(n: int, pk_col: str = "pk") -> Column:
    """R5: hash of handle-key values — per-key order preserved."""
    return h32(F.col(pk_col)) % n


def partition_by_columns(n: int, cols: list[str]) -> Column:
    """R6: hash of named column values."""
    return h32(F.concat_ws("\x01", *[F.col(c).cast("string") for c in cols])) % n


def worker_lane(n_workers: int, table_id_col: str = "table_id") -> Column:
    """R8: ``tableID % prime % workerCount`` ordered lanes
    (``mysql_sink.go:143-149``; prime = 31 mirrors the reference intent)."""
    return (F.col(table_id_col) % 31) % n_workers


def route(df: DataFrame, rules: list[DispatchRule], n_partitions: int,
          default_topic: str | None = None) -> DataFrame:
    """R1: first matching rule assigns topic + partition columns.

    Rows matching no rule fall back to ``default_topic`` (the Kafka
    sink-URI path in the reference — ``eventrouter/event_router.go:36,
    72,89`` threads it into every generator as the no-match answer) or,
    absent one, the ``{schema}_{table}`` convention; partitioning falls
    back to index-value. The router always has this catch-all
    (``event_router.go:78-137`` appends a ``['*','*']`` rule), so no row
    ever carries a NULL topic into a partitioned sink.
    """
    topic: Column = F.lit(None).cast("string")
    part: Column = F.lit(None).cast("bigint")
    assigned: Column = F.lit(False)
    for rule in rules:
        m = _matcher_cond(rule.matcher, "schema_name", "table_name") & ~assigned
        t = topic_expr(rule.topic)
        if rule.partition == "table":
            p = partition_by_table(n_partitions)
        elif rule.partition == "ts":
            p = partition_by_ts(n_partitions)
        elif rule.partition == "columns":
            p = partition_by_columns(n_partitions, rule.partition_columns)
        elif rule.partition == "key":
            p = h32(F.lit(rule.key)) % n_partitions
        else:  # default / index-value
            p = partition_by_index_value(n_partitions)
        topic = F.when(m, t).otherwise(topic)
        part = F.when(m, p).otherwise(part)
        assigned = assigned | _matcher_cond(rule.matcher, "schema_name", "table_name")
    topic = F.coalesce(topic, topic_expr(default_topic or "{schema}_{table}"))
    part = F.coalesce(part, partition_by_index_value(n_partitions))
    return df.withColumn("topic", topic).withColumn("partition", part.cast("bigint"))
