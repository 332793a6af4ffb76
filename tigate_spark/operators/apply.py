"""Replica apply (K1) — materialize a change stream onto table state.

Reference parity: the MySQL sink applies ordered per-key changes
transactionally (``pkg/sink/mysql/mysql_writer.go:727-755``,
``prepareDMLs :670-725``); safe-mode rewrites INSERT→REPLACE so replay is
idempotent (``mysql_writer.go:686-691``). In Spark the batch-equivalent is
"last-writer-wins per key" — a per-key ``max_by`` on the total order
``(commit_ts, start_ts, op_rank, seq)``, then MERGE onto the base
snapshot.

Scale: both steps are single-shuffle on the key; no window + full sort is
required (``max_by`` aggregates map-side). The base join broadcasts when
the base is small, else it's a co-partitioned SMJ on pk.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tigate_spark.operators.ordering import op_rank_col


def latest_change_per_key(changes: DataFrame, payload_cols: list[str],
                          key_cols: list[str] | None = None) -> DataFrame:
    """Reduce the stream to the final change per key (default
    ``(table_id, pk)``; composite/unique-key tables pass their own
    ``key_cols`` — the reference's many-pk-or-uk case).

    One hash aggregation: ``max_by(payload, order_key)`` with the
    lexicographic order key (commit_ts, start_ts, op_rank, seq).
    """
    keys = key_cols or ["table_id", "pk"]
    order_key = F.struct(
        F.col("commit_ts"), F.col("start_ts"), op_rank_col(), F.col("seq")
    )
    payload = F.struct(F.col("op").alias("op"), *[F.col(c).alias(c) for c in payload_cols])
    agg = changes.groupBy(*keys).agg(
        F.max_by(payload, order_key).alias("last"),
        F.max("commit_ts").alias("last_commit_ts"),
    )
    cols = [*[F.col(k) for k in keys], F.col("last.op").alias("op"),
            F.col("last_commit_ts")]
    cols += [F.col(f"last.{c}").alias(c) for c in payload_cols]
    return agg.select(*cols)


def force_replicate_rowkey(changes: DataFrame, payload_cols: list[str]) -> DataFrame:
    """Force-replicate: a table with no handle key gets a synthetic row key
    = hash of the full payload image, so delete-by-key still works
    (``ChangefeedConfig.ForceReplicate``, ``pkg/config/changefeed.go:21-38``;
    the force_replicate_table integration scenario)."""
    row_key = F.md5(F.concat_ws("\x01", *[F.col(c).cast("string") for c in payload_cols]))
    return changes.withColumn("row_key", row_key)


def materialize(changes: DataFrame, payload_cols: list[str]) -> DataFrame:
    """Final table state from an empty base: live rows = keys whose last
    op is not delete."""
    last = latest_change_per_key(changes, payload_cols)
    return last.filter(F.col("op") != "D").drop("op")


def merge_into_base(base: DataFrame, changes: DataFrame,
                    key_col: str, set_cols: dict[str, str]) -> DataFrame:
    """MERGE the stream's final per-key state onto a base snapshot:

    - last op D      → row deleted
    - last op I/U    → row upserted (``set_cols``: base_col ← change_col)
    - untouched keys → base row kept

    Equivalent of safe-mode REPLACE + delete-by-pk replay
    (``mysql_writer.go:686``, ``sql_builder.go:104-111``).
    """
    last = latest_change_per_key(changes, list(set_cols.values()))
    joined = base.alias("b").join(
        last.alias("c"), F.col(f"b.{key_col}") == F.col("c.pk"), "full_outer"
    )
    keep = F.col("c.op").isNull() | (F.col("c.op") != "D")
    out_cols = []
    for c in base.columns:
        if c in set_cols:
            out_cols.append(
                F.when(F.col("c.op").isNotNull(), F.col(f"c.{set_cols[c]}"))
                .otherwise(F.col(f"b.{c}")).alias(c)
            )
        elif c == key_col:
            out_cols.append(F.coalesce(F.col(f"b.{key_col}"), F.col("c.pk")).alias(c))
        else:
            out_cols.append(F.col(f"b.{c}").alias(c))
    return joined.filter(keep).select(*out_cols)


def scd2_history(changes: DataFrame, payload_cols: list[str]) -> DataFrame:
    """Type-2 slowly-changing-dimension history from the change stream:
    one validity interval per change, closed by the key's next change
    (``valid_to`` null = current). Deletes close the prior interval and
    emit no row of their own; the live row is the open interval of a key
    whose last change wasn't a delete.

    This is the standard changelog→warehouse-dimension materialization a
    CDC consumer builds downstream of the replica sink (Kimball SCD type
    2); one shuffle on the key, window-local otherwise — same scale shape
    as :func:`materialize`.
    """
    from pyspark.sql import Window

    from tigate_spark.operators.ordering import op_rank_col

    # the engine's canonical per-key total order (T1)
    w = Window.partitionBy("table_id", "pk").orderBy(
        "commit_ts", "start_ts", op_rank_col(), "seq"
    )
    nxt = changes.select(
        "table_id", "pk", "op", "commit_ts", "start_ts", "seq", *payload_cols
    ).withColumn("valid_to", F.lead("commit_ts").over(w))
    return (
        nxt.filter(F.col("op") != "D")
        .select(
            "table_id", "pk", *payload_cols,
            F.col("commit_ts").alias("valid_from"),
            "valid_to",
            F.col("valid_to").isNull().alias("is_current"),
            "seq",
        )
    )
