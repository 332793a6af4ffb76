"""Projection / transform operators P1–P7 (SURVEY §2.4).

All built-in column expressions (column pruning + codegen apply).

Reference parity:
- P1 column selector   ``pkg/common/columnselector/column_selector.go:23-101``
- P2 updated-cols only ``pkg/config/sink.go:160``; ``codec/open/codec.go:56-72``
- P3 handle-key-only   ``pkg/config/sink.go:162-163``; ``open/codec.go:43-48``
- P4 type rendering    ``pkg/common/helper.go:19-80`` (FormatColVal)
- P6 update split      ``mounter.go:80-109``; ``dml_event.go:100-104``
- P7 checksum          ``pkg/sink/codec/common/verify_checksum.go``
"""

from __future__ import annotations

import fnmatch

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tigate_spark.config import ColumnSelector

#: metadata columns that survive any column selection
META_COLS = ("schema_name", "table_name", "table_id", "op",
             "start_ts", "commit_ts", "seq", "pk")


def column_selector(df: DataFrame, selector: ColumnSelector) -> DataFrame:
    """P1: keep only selected payload columns (+ change metadata)."""
    keep: list[str] = []
    for c in df.columns:
        if c in META_COLS:
            keep.append(c)
            continue
        if any(fnmatch.fnmatch(c, pat) for pat in selector.columns):
            keep.append(c)
    return df.select(*keep)


def handle_key_only(df: DataFrame, threshold: int,
                    payload_col: str = "after") -> DataFrame:
    """P3: rows whose encoded payload exceeds ``threshold`` bytes are
    reduced to their handle key (pk) — payload nulled, flag set."""
    too_big = F.length(F.coalesce(F.col(payload_col), F.lit(""))) > threshold
    return df.withColumn("only_handle_key", too_big).withColumn(
        payload_col, F.when(too_big, F.lit(None)).otherwise(F.col(payload_col))
    )


def split_updates(df: DataFrame) -> DataFrame:
    """P6: U → (D with before-image) + (I with after-image); I/D pass through.

    Emitted delete sorts before the paired insert, matching the event-store
    key order D < U < I (``logservice/eventstore/format.go:78-85``).
    """
    pieces = F.when(
        F.col("op") == "U",
        F.array(
            F.struct(F.lit("D").alias("op2"), F.col("before").alias("image"),
                     F.lit(1).alias("piece")),
            F.struct(F.lit("I").alias("op2"), F.col("after").alias("image"),
                     F.lit(2).alias("piece")),
        ),
    ).otherwise(
        F.array(
            F.struct(
                F.col("op").alias("op2"),
                F.when(F.col("op") == "D", F.col("before")).otherwise(F.col("after")).alias("image"),
                F.lit(1).alias("piece"),
            )
        )
    )
    exploded = df.withColumn("piece", F.explode(pieces))
    return (
        exploded.withColumn("op_out", F.col("piece.op2"))
        .withColumn("image", F.col("piece.image"))
        .withColumn("piece_no", F.col("piece.piece"))
        .drop("piece", "op", "before", "after")
        .withColumnRenamed("op_out", "op")
    )


def row_checksum(df: DataFrame, cols: list[str], out_col: str = "checksum") -> DataFrame:
    """P7: deterministic row integrity checksum (md5 of NUL-joined values;
    portable across engines)."""
    parts = [F.coalesce(F.col(c).cast("string"), F.lit("\\N")) for c in cols]
    return df.withColumn(out_col, F.md5(F.concat_ws("\x01", *parts)))


#: payload image schema for the canonical synthetic images
IMG_MAP = "map<string,string>"


def updated_columns_projection(df: DataFrame) -> DataFrame:
    """P2: only-updated-columns — for update rows, emit just the column
    names whose value changed between the before and after images
    (``pkg/config/sink.go:160``; open-codec ``open/codec.go:56-72`` drops
    unchanged columns from the ``old`` image).

    The images are JSON; the diff is a JVM-side map comparison
    (``from_json`` → ``map_filter``), no Python.
    """
    from pyspark.sql import functions as F

    b = F.from_json(F.col("before"), IMG_MAP)
    a = F.from_json(F.col("after"), IMG_MAP)
    changed = F.array_sort(
        F.map_keys(F.map_filter(b, lambda k, v: v != a[k]))
    )
    return (
        df.filter(F.col("op") == "U")
        .withColumn("changed_cols", changed)
        .withColumn("n_changed", F.size("changed_cols").cast("bigint"))
    )
