"""Multi-version schema registry + as-of resolution (T3, T4, S4 — SURVEY §2.2).

Reference parity: ``versionedTableInfoStore`` keeps per-table ordered
``(version_ts, TableInfo)`` and resolves "largest version ≤ ts"
(``logservice/schemastore/multi_version.go:35-52,98-128``); every DML batch
is decoded with the schema as of ``commitTs - 1``
(``pkg/eventservice/event_broker.go:492``). DML/DDL interleave by commit ts
(``event_broker.go:459-462``).

Spark shape: the registry is a tiny dimension → **broadcast** as-of join
(range condition + max_by), never a shuffle of the fact stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def synthetic_schema_versions(spark: SparkSession, changes: DataFrame,
                              n_tables: int = 4, n_versions: int = 5,
                              step_us: int = 7 * 86400 * 1_000_000) -> DataFrame:
    """Deterministic registry fixture: for each table, ``n_versions``
    schema versions starting at the stream's min commit_ts, one per
    ``step_us``. version 0 predates everything (bootstrap snapshot)."""
    base = changes.agg(F.min("commit_ts").alias("t0"))
    grid = spark.range(n_tables).select(F.col("id").alias("table_id")).crossJoin(
        spark.range(n_versions).select(F.col("id").alias("version"))
    )
    return grid.crossJoin(base).select(
        "table_id",
        "version",
        (F.col("t0") + F.col("version") * F.lit(step_us)).alias("version_ts"),
        F.format_string("v%d", F.col("version")).alias("schema_tag"),
    )


def asof_schema_join(changes: DataFrame, versions: DataFrame) -> DataFrame:
    """T3: attach the schema version in effect at ``commit_ts - 1``.

    Broadcast range-join + ``max_by`` per event — the registry is small by
    construction (schemas, not data), so the stream never shuffles.
    """
    v = F.broadcast(versions.select(
        F.col("table_id").alias("v_table_id"), "version", "version_ts", "schema_tag"
    ))
    joined = changes.join(
        v,
        (F.col("table_id") == F.col("v_table_id"))
        & (F.col("version_ts") <= F.col("commit_ts") - 1),
        "left",
    )
    keys = [c for c in changes.columns]
    return (
        joined.groupBy(*keys)
        .agg(
            F.max("version").alias("schema_version"),
            F.max_by("schema_tag", "version").alias("schema_tag"),
        )
    )


def merge_dml_ddl(dml: DataFrame, ddl: DataFrame) -> DataFrame:
    """T4: interleave DDL into the DML stream in commit order; at equal ts
    the DDL sorts first (its effects apply to subsequent DML — the barrier
    semantics of ``maintainer/barrier.go:26-36`` collapse to this rank in
    batch mode). Output carries ``is_ddl`` + a deterministic merge rank."""
    d = dml.select(
        "table_id", "commit_ts", F.lit(0).alias("is_ddl"),
        F.col("seq").alias("src_seq"), F.lit(None).cast("string").alias("query"),
    )
    x = ddl.select(
        "table_id", "commit_ts", F.lit(1).alias("is_ddl"),
        F.col("seq").alias("src_seq"), F.col("query"),
    )
    return d.unionByName(x)


#: payload columns in the order schema versions introduce them — version k
#: "knows" the first k+1 columns (the per-version TableInfo column list,
#: ``pkg/common/table_info_helper.go:311-369``)
VERSION_COLUMNS = ["event_type", "value_cents", "user_id", "props"]


def typed_view(changes_with_version: DataFrame) -> DataFrame:
    """T3/M3: per-version typed projection — each event exposes exactly the
    columns its resolved schema version defines; later-version columns read
    as NULL under an older schema (decode-with-TableInfo-as-of-commitTs,
    ``pkg/eventservice/event_broker.go:492``).

    This is the map-payload normalization of SURVEY §7.1: one physical
    schema, per-version column visibility as expressions — no per-version
    DataFrame schemas, so a single plan serves mixed-version batches.
    """
    out = changes_with_version
    for i, c in enumerate(VERSION_COLUMNS):
        out = out.withColumn(
            f"v_{c}", F.when(F.col("schema_version") >= i, F.col(c))
        )
    return out


def asof_schema_join_grouped(changes: DataFrame, versions: DataFrame) -> DataFrame:
    """T3 alternate physical strategy: cogrouped ``pd.merge_asof`` per
    table — the path for registries too large to broadcast (the broadcast
    range join of :func:`asof_schema_join` explodes when versions-per-table
    is big). Both sides shuffle once on table_id; the as-of resolution is
    a linear merge inside each Arrow batch.
    """
    import pandas as pd

    out_schema = "seq BIGINT, table_id BIGINT, schema_version BIGINT, schema_tag STRING"

    def fn(ev: pd.DataFrame, ver: pd.DataFrame) -> pd.DataFrame:
        ev = ev.sort_values("asof_ts")
        ver = ver.sort_values("version_ts")
        if len(ver) == 0:
            m = ev.assign(version=pd.Series([None] * len(ev), dtype="Int64"),
                          schema_tag=None)
        else:
            m = pd.merge_asof(ev, ver[["version_ts", "version", "schema_tag"]],
                              left_on="asof_ts", right_on="version_ts",
                              direction="backward")
        return pd.DataFrame({
            "seq": m["seq"].astype("int64"),
            "table_id": m["table_id"].astype("int64"),
            "schema_version": m["version"].astype("Int64"),
            "schema_tag": m["schema_tag"],
        })

    ev = changes.select("seq", "table_id",
                        (F.col("commit_ts") - 1).alias("asof_ts"))
    ver = versions.select("table_id", "version_ts", "version", "schema_tag")
    return (
        ev.groupBy("table_id")
        .cogroup(ver.groupBy("table_id"))
        .applyInPandas(lambda k, e, v: fn(e, v), out_schema)
    )
