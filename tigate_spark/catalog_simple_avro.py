"""Catalog entries for the simple-protocol **Avro encoding format**
(``pkg/sink/codec/simple/marshaller.go:50-56`` EncodingFormat dispatch;
record shapes ``simple/avro.go:107-310``; embedded schema
``simple/message.json``) — the byte-exact binary twin of the engine's
simple-JSON family, generated as dual-dialect column expressions
(:mod:`tigate_spark.functions.simple_avro`) and round-tripped through an
independent schema-driven Python Avro reader."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tigate_spark.catalog import (
    _DDL_CTE,
    _ddl_stream,
    _img_ck_lanes,
    _IMG_STRUCT,
    _simple_ck_oracle_ctes,
    register,
)
from tigate_spark.functions.simple_avro import (
    LARGE_MESSAGE_THRESHOLD,
    decode_simple_avro_large,
    encode_simple_avro,
    encode_simple_avro_bootstrap,
    encode_simple_avro_ddl,
    encode_simple_avro_large,
    oracle_suffix,
    simple_avro_bootstrap_steps,
    simple_avro_ddl_steps,
    simple_avro_dml_steps,
    simple_avro_large_message_steps,
    simple_avro_watermark_sql,
)
from tigate_spark.sources.changes import ORACLE_CHANGES_CTE, changes_stream

_HOUR_US = 3_600_000_000


@register(
    "encoder_simple_avro",
    ORACLE_CHANGES_CTE
    + oracle_suffix(simple_avro_dml_steps("duckdb"), "changes")
    + "\nSELECT seq, message_hex FROM sa_msg",
    doc="Simple-protocol Avro encoding format, DML wire (marshaller.go:"
        "50-56 EncodingFormat dispatch; avro.go:246-310 newDMLMessageMap; "
        "goavro BinaryFromNative raw Avro binary): union-keyed Message "
        "wrapper, DML record, data/old maps with the 8-branch value union "
        "(UnsignedBigint + Timestamp records exercised), byte-exact hex "
        "in both engines — pure JVM column expressions, zero Python",
)
def encoder_simple_avro(spark: SparkSession, sf_dir: str) -> DataFrame:
    ch = changes_stream(spark, sf_dir)
    return encode_simple_avro(ch).select("seq", "message_hex")


@register(
    "decoder_simple_avro",
    ORACLE_CHANGES_CTE + """
SELECT seq, 'app' AS database, table_name, table_id, op,
  commit_ts, commit_ts // 1000 AS build_ts,
  CAST(1 AS BIGINT) AS schema_version,
  pk, event_type,
  CASE WHEN op = 'D' THEN value_cents - 100 ELSE value_cents END
    AS value_cents,
  user_id,
  strftime(make_timestamp(
    CASE WHEN op = 'D' THEN commit_ts - 1000000 ELSE commit_ts END),
    '%Y-%m-%d %H:%M:%S') AS updated_at
FROM changes
""",
    doc="E7 simple-Avro consumer: Spark-encoded DML wire decoded back to "
        "typed change rows by an INDEPENDENT schema-driven Python Avro "
        "reader over Arrow mapInPandas (encoder and decoder meet only at "
        "the byte level — the craft-decoder precedent); live image "
        "surfaces (old for DELETE), union records unwrap "
        "(UnsignedBigint.value, Timestamp.value)",
)
def decoder_simple_avro(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tigate_spark.functions.simple_avro import decode_simple_avro_rows

    ch = changes_stream(spark, sf_dir)
    return decode_simple_avro_rows(
        encode_simple_avro(ch).select("seq", "message_hex"))


@register(
    "encoder_simple_avro_checksum",
    _simple_ck_oracle_ctes()
    + ", sa_in AS (SELECT c.*, k.cur, k.prev FROM changes c "
      "JOIN crcs k USING (seq))"
    + oracle_suffix(simple_avro_dml_steps("duckdb", with_checksum=True),
                    "sa_in")
    + "\nSELECT seq, message_hex FROM sa_msg",
    doc="Integrity-enabled simple-Avro wire (avro.go:273-282: "
        "EnableRowChecksum fills the Checksum union holder): the DML "
        "record carries Checksum{version, corrupted, current, previous} "
        "with the r11 byte-exact TiDB row checksum pair; the oracle "
        "recomputes both CRC folds AND the Avro framing from scratch",
)
def encoder_simple_avro_checksum(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    from tigate_spark.operators.projections import tidb_row_checksum

    ch = changes_stream(spark, sf_dir, with_images=True)
    a = F.from_json(F.col("after"), _IMG_STRUCT)
    b = F.from_json(F.col("before"), _IMG_STRUCT)
    live = F.when(F.col("op") == "D", b).otherwise(a)
    ch = ch.withColumn("cur", tidb_row_checksum(_img_ck_lanes(live))) \
           .withColumn("prev",
                       F.when(F.col("op") == "U",
                              tidb_row_checksum(_img_ck_lanes(b)))
                       .otherwise(F.lit(0)).cast("bigint"))
    return encode_simple_avro(ch, with_checksum=True) \
        .select("seq", "message_hex")


@register(
    "encoder_simple_avro_claim_check",
    ORACLE_CHANGES_CTE
    + oracle_suffix(
        simple_avro_large_message_steps("duckdb", "claim-check"), "changes")
    + "\nSELECT seq, message_hex, sa_oversized AS offloaded, "
      "sa_loc AS claim_location FROM sa_msg",
    doc="Simple-Avro claim-check wire (encoder.go:84-120: oversized "
        "message offloads to the md5-addressed store, then the event is "
        "re-marshalled with onlyHandleKey=true AND claimCheckLocation "
        "set — avro.go:261-271 fills BOTH union holders; scenario "
        "kafka_simple_claim_check_avro): byte-exact hex for the inline "
        "and degraded forms in both engines",
)
def encoder_simple_avro_claim_check(spark: SparkSession,
                                    sf_dir: str) -> DataFrame:
    ch = changes_stream(spark, sf_dir)
    return encode_simple_avro_large(
        ch, "claim-check", keep=("sa_oversized", "sa_loc")).select(
        "seq", "message_hex",
        F.col("sa_oversized").alias("offloaded"),
        F.col("sa_loc").alias("claim_location"))


_T2 = 2 * LARGE_MESSAGE_THRESHOLD


@register(
    "decoder_simple_avro_degraded",
    ORACLE_CHANGES_CTE
    + oracle_suffix(simple_avro_dml_steps("duckdb"), "changes")
    + f"""
SELECT seq,
  CAST(CASE WHEN length(message_hex) > {_T2} THEN 1 ELSE 0 END AS BIGINT)
    AS only_handle_key,
  CAST(NULL AS VARCHAR) AS claim_location,
  pk,
  CASE WHEN length(message_hex) > {_T2} THEN NULL
       ELSE event_type END AS event_type,
  CASE WHEN length(message_hex) > {_T2} THEN NULL
       WHEN op = 'D' THEN value_cents - 100
       ELSE value_cents END AS value_cents,
  CASE WHEN length(message_hex) > {_T2} THEN NULL
       ELSE user_id END AS user_id,
  CAST(commit_ts AS BIGINT) AS commit_ts
FROM sa_msg
""",
    doc="Simple-Avro handle-key-only consumer (decoder.go:145-146,"
        "197-232; scenario kafka_simple_handle_key_only_avro): degraded "
        "messages surface only the handle key with only_handle_key=1 — "
        "the consumer contract that a degraded row triggers an upstream "
        "snapshot fetch instead of a partial apply; full messages "
        "surface their live image (decoder twin of the claim-check "
        "encoder's lossy sibling)",
)
def decoder_simple_avro_degraded(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    ch = changes_stream(spark, sf_dir)
    wire = encode_simple_avro_large(ch, "handle-key-only") \
        .select("seq", "message_hex")
    return decode_simple_avro_large(wire)


@register(
    "consumer_simple_avro_claim_check_e2e",
    ORACLE_CHANGES_CTE
    + oracle_suffix(simple_avro_dml_steps("duckdb"), "changes")
    + f"""
SELECT seq, pk, event_type,
  CASE WHEN op = 'D' THEN value_cents - 100 ELSE value_cents END
    AS value_cents,
  user_id, CAST(commit_ts AS BIGINT) AS commit_ts,
  CAST(CASE WHEN length(message_hex) > {_T2} THEN 1 ELSE 0 END AS BIGINT)
    AS was_offloaded
FROM sa_msg
""",
    doc="Simple-Avro claim-check fetch-back e2e (decoder.go:141-142,"
        "168-195 assembleClaimCheckRowChangedEvent): the consumer reads "
        "claimCheckLocation off the degraded wire, joins the "
        "content-addressed offload store, decodes the stored FULL "
        "message, and restores every column — proving the offloaded "
        "bytes round-trip identical to the never-degraded lane",
)
def consumer_simple_avro_claim_check_e2e(spark: SparkSession,
                                         sf_dir: str) -> DataFrame:
    from tigate_spark.functions.simple_avro import decode_simple_avro_rows

    ch = changes_stream(spark, sf_dir)
    enc = encode_simple_avro_large(
        ch, "claim-check", keep=("sa_oversized", "sa_loc", "sa_full_h"))
    # the side-write the reference's claimCheck.WriteMessage performs —
    # content-addressed, so identical wires share one object
    store = enc.filter(F.col("sa_oversized") == 1).select(
        F.col("sa_loc").alias("location"),
        F.col("sa_full_h").alias("stored_hex")).dropDuplicates(["location"])
    dec = decode_simple_avro_large(enc.select("seq", "message_hex"))
    inline = dec.filter(F.col("claim_location").isNull()).select(
        "seq", "pk", "event_type", "value_cents", "user_id", "commit_ts",
        F.lit(0).cast("bigint").alias("was_offloaded"))
    fetched = dec.filter(F.col("claim_location").isNotNull()) \
        .select("seq", "claim_location") \
        .join(store, F.col("claim_location") == F.col("location")) \
        .select("seq", F.col("stored_hex").alias("message_hex"))
    refull = decode_simple_avro_rows(fetched).select(
        "seq", "pk", "event_type", "value_cents", "user_id", "commit_ts",
        F.lit(1).cast("bigint").alias("was_offloaded"))
    return inline.unionByName(refull)


@register(
    "encoder_simple_avro_watermark",
    ORACLE_CHANGES_CTE
    + f"""
, ticks AS (
  SELECT commit_ts // {_HOUR_US} AS bucket,
         max(commit_ts) AS resolved_ts
  FROM changes GROUP BY 1
)
SELECT bucket, {simple_avro_watermark_sql('duckdb')} AS message_hex
FROM ticks
""",
    doc="Simple-Avro WATERMARK messages (avro.go:136-155 "
        "newResolvedMessageMap): one resolved-ts broadcast per hour tick "
        "(the K6 checkpoint cadence), Watermark{version, commitTs, "
        "buildTs} behind the Message union — buildTs pinned to tick ms",
)
def encoder_simple_avro_watermark(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    ch = changes_stream(spark, sf_dir)
    ticks = ch.groupBy(
        (F.col("commit_ts") / _HOUR_US).cast("bigint").alias("bucket")
    ).agg(F.max("commit_ts").alias("resolved_ts"))
    return ticks.selectExpr(
        "bucket",
        f"{simple_avro_watermark_sql('spark')} AS message_hex")


_TABLES_CTE = ORACLE_CHANGES_CTE + """
, tables AS (
  SELECT schema_name, table_name, table_id,
         min(commit_ts) AS version_ts
  FROM changes GROUP BY 1, 2, 3
)
"""


@register(
    "encoder_simple_avro_bootstrap",
    _TABLES_CTE
    + oracle_suffix(simple_avro_bootstrap_steps("duckdb"), "tables")
    + "\nSELECT table_id, message_hex FROM sa_msg",
    doc="Simple-Avro BOOTSTRAP handshake (avro.go:157-177 "
        "newBootstrapMessageMap; TableSchema map avro.go:27-134): full "
        "TableSchema record — ColumnSchema[] with per-column DataType "
        "(numeric columns carry unsigned/zerofill union holders, "
        "enum/decimal holders null), primary IndexSchema — one versioned "
        "message per table at its first-commit UpdateTS analog",
)
def encoder_simple_avro_bootstrap(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    ch = changes_stream(spark, sf_dir)
    tables = ch.groupBy("schema_name", "table_name", "table_id") \
        .agg(F.min("commit_ts").alias("version_ts"))
    return encode_simple_avro_bootstrap(tables) \
        .select("table_id", "message_hex")


@register(
    "decoder_simple_avro_bootstrap",
    _TABLES_CTE + """
SELECT table_id, 'app' AS database, table_name,
  version_ts AS schema_version, version_ts // 1000 AS build_ts,
  CAST(5 AS BIGINT) AS n_columns,
  'pk,event_type,value_cents,user_id,updated_at' AS col_names,
  'bigint,varchar,bigint,bigint,timestamp' AS col_types,
  'pk' AS pk_cols
FROM tables
""",
    doc="E7 simple-Avro bootstrap consumer: the TableSchema walk of "
        "newTableSchemaFromAvroNative (avro.go:385-467) through the "
        "independent Python reader — column names/mysqlTypes in "
        "declaration order, the primary index's key columns recovered",
)
def decoder_simple_avro_bootstrap(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    from tigate_spark.functions.simple_avro import (
        decode_simple_avro_bootstrap,
    )

    ch = changes_stream(spark, sf_dir)
    tables = ch.groupBy("schema_name", "table_name", "table_id") \
        .agg(F.min("commit_ts").alias("version_ts"))
    return decode_simple_avro_bootstrap(
        encode_simple_avro_bootstrap(tables).select("message_hex"))


@register(
    "encoder_simple_avro_ddl",
    _DDL_CTE
    + ", sa_in AS (SELECT *, 'app' AS schema_name, "
      "'t' || CAST(table_id AS VARCHAR) AS table_name FROM ddl)"
    + oracle_suffix(simple_avro_ddl_steps("duckdb"), "sa_in")
    + "\nSELECT seq, message_hex FROM sa_msg",
    doc="Simple-Avro DDL messages (avro.go:179-211 newDDLMessageMap): "
        "DDLType enum (getDDLType order CREATE/ALTER/ERASE/RENAME/"
        "TRUNCATE/CINDEX/DINDEX/QUERY), raw SQL, union-held tableSchema/"
        "preTableSchema with the JSON family's presence rule (absent for "
        "ERASE-after / CREATE-before)",
)
def encoder_simple_avro_ddl(spark: SparkSession, sf_dir: str) -> DataFrame:
    ddl = _ddl_stream(spark, sf_dir) \
        .withColumn("schema_name", F.lit("app")) \
        .withColumn("table_name",
                    F.concat(F.lit("t"), F.col("table_id").cast("string")))
    return encode_simple_avro_ddl(ddl).select("seq", "message_hex")
