"""Protocol encoders E1/E2 (SURVEY §2.6) — canal-json + open-protocol.

Reference parity:
- E1 canal-json message shape ``pkg/sink/codec/canal/canal_json_message.go:43-60``
  (database, table, pkNames, isDdl, type, es, ts, data[], old[]; the
  ``_tidb`` extension carries commitTs, ``:139``).
- E2 open-protocol key ``{ts, scm, tbl, t}`` + value ``{u|d|p: cols}``
  ``pkg/sink/codec/open/codec.go:24-120``.

The encoders are pure ``format_string`` / ``to_json`` column expressions —
JVM-side, codegen'd, zero Python. Field layout is golden-tested and the
whole message string is oracle-checked byte-for-byte (printf on both
engines).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_CANAL_FMT = (
    '{"id":0,"database":"%s","table":"%s","pkNames":["pk"],"isDdl":false,'
    '"type":"%s","es":%d,"ts":%d,"sql":"",'
    '"data":%s,"old":%s,"_tidb":{"commitTs":%d}}'
)

_CANAL_TYPE = {"I": "INSERT", "U": "UPDATE", "D": "DELETE"}

#: java.sql.Types codes the reference's canal encoder emits per column
#: (canal_json_message.go:55-57; JavaSQLType map encoder.go:218). The
#: engine's change payload is (pk BIGINT, event_type VARCHAR,
#: value_cents BIGINT) → BIGINT=-5, VARCHAR=12.
CANAL_SQL_TYPE_MAP = '{"pk":-5,"event_type":12,"value_cents":-5}'
#: default mysqlType rendering — tiflow ``codec/utils.GetMySQLType(col,
#: fullType=false)``: short type name via types.TypeToStr (+" unsigned"/
#: " zerofill" when flagged; none here)
CANAL_MYSQL_TYPE_MAP = (
    '{"pk":"bigint","event_type":"varchar","value_cents":"bigint"}'
)
#: content-compatible rendering — ``GetMySQLType(col, fullType=true)`` =
#: FieldType.CompactStr full descriptors (display width / length), the
#: strings the official Canal adapter emits and expects
CANAL_MYSQL_TYPE_MAP_FULL = (
    '{"pk":"bigint(20)","event_type":"varchar(255)",'
    '"value_cents":"bigint(20)"}'
)

_CANAL_TYPED_FMT = (
    '{"id":0,"database":"%s","table":"%s","pkNames":["pk"],"isDdl":false,'
    '"type":"%s","es":%d,"ts":%d,"sql":"",'
    '"sqlType":' + CANAL_SQL_TYPE_MAP + ','
    '"mysqlType":%s,'
    '"data":%s,"old":%s,"_tidb":{"commitTs":%d}}'
)


def encode_canal_json_typed(df: DataFrame, out_col: str = "message",
                            content_compatible: bool = False) -> DataFrame:
    """E1 with column type metadata: the full JSONMessage shape including
    the per-column ``sqlType`` (java.sql.Types codes) and ``mysqlType``
    maps (``canal_json_message.go:55-57``; maps built per table info in
    ``canal/encoder.go:155,218-277``). The maps here come from the fixed
    change-payload schema; with per-table schemas they are rendered from
    the broadcast schema registry (T3) the same way.

    ``content_compatible=True`` is the sink URI's ``content-compatible=
    true`` (``common/config.go:65,262-265``; scenarios
    ``canal_json_content_compatible/``, ``canal_json_adapter_
    compatibility/``): mysqlType renders FULL type descriptors
    (``canal/encoder.go:260`` GetMySQLType(col, true) — "bigint(20)",
    "varchar(255)") for the official Canal adapter, and
    ``OnlyOutputUpdatedColumns`` is forced on (config.go:264), so an
    UPDATE's ``old`` image carries ONLY the columns whose value changed
    (tiflow fillUpdateColumns)."""
    data = F.when(F.col("op") == "D", F.col("before")).otherwise(F.col("after"))
    if content_compatible:
        from tigate_spark.operators.projections import only_updated_old_image

        type_map = CANAL_MYSQL_TYPE_MAP_FULL
        # only-updated columns in old (tiflow fillUpdateColumns) — the
        # general JVM image diff, not a stream-specific shortcut
        old = F.when(
            F.col("op") == "U",
            only_updated_old_image(F.col("before"), F.col("after")))
    else:
        type_map = CANAL_MYSQL_TYPE_MAP
        old = F.when(F.col("op") == "U", F.col("before"))
    msg = F.format_string(
        _CANAL_TYPED_FMT,
        F.col("schema_name"),
        F.col("table_name"),
        canal_type_col(),
        F.expr("commit_ts div 1000"),
        F.expr("commit_ts div 1000"),
        F.lit(type_map),
        F.concat(F.lit("["), F.coalesce(data, F.lit("null")), F.lit("]")),
        F.when(old.isNotNull(), F.concat(F.lit("["), old, F.lit("]"))).otherwise(F.lit("null")),
        F.col("commit_ts"),
    )
    return df.withColumn(out_col, msg)


def canal_type_col(op_col: str = "op") -> Column:
    return (
        F.when(F.col(op_col) == "I", "INSERT")
        .when(F.col(op_col) == "U", "UPDATE")
        .otherwise("DELETE")
    )


def encode_canal_json(df: DataFrame, out_col: str = "message",
                      tidb_extension: bool = True,
                      only_updated_old: bool = False) -> DataFrame:
    """E1: one canal-json message per change row.

    ``data``: after-image for I/U, before-image for D (canal semantics);
    ``old``: before-image for U, else null. ``es``/``ts`` are millisecond
    clocks (``canal_json_message.go:48-52``); ``_tidb.commitTs`` keeps the
    exact µs commit ts.

    ``tidb_extension=False`` is the reference's
    ``enable-tidb-extension=false`` (the sink default; config
    ``sink.go:410``): the message is PLAIN canal-json — no ``_tidb``
    field, consumers get only the millisecond ``es`` clock, and
    watermark/resolved messages (which exist only as the extension's
    TYPE_TIDB_WATERMARK) cannot be emitted.

    ``only_updated_old=True`` is the standalone
    ``only-output-updated-columns=true`` sink option
    (``pkg/config/sink.go:160``; tiflow ``fillUpdateColumns``): an
    UPDATE's ``old`` image carries only the columns whose value changed.
    """
    data = F.when(F.col("op") == "D", F.col("before")).otherwise(F.col("after"))
    if only_updated_old:
        from tigate_spark.operators.projections import only_updated_old_image

        old = F.when(
            F.col("op") == "U",
            only_updated_old_image(F.col("before"), F.col("after")))
    else:
        old = F.when(F.col("op") == "U", F.col("before"))
    args = [
        F.col("schema_name"),
        F.col("table_name"),
        canal_type_col(),
        F.expr("commit_ts div 1000"),
        F.expr("commit_ts div 1000"),
        F.concat(F.lit("["), F.coalesce(data, F.lit("null")), F.lit("]")),
        F.when(old.isNotNull(), F.concat(F.lit("["), old, F.lit("]"))).otherwise(F.lit("null")),
    ]
    if tidb_extension:
        fmt = _CANAL_FMT
        args.append(F.col("commit_ts"))
    else:
        fmt = _CANAL_FMT.replace(',"_tidb":{"commitTs":%d}', "")
    msg = F.format_string(fmt, *args)
    return df.withColumn(out_col, msg)


_OPEN_KEY_FMT = '{"ts":%d,"scm":"%s","tbl":"%s","t":1}'
_OPEN_VAL_U_FMT = '{"u":%s,"p":%s}'
_OPEN_VAL_I_FMT = '{"u":%s}'
_OPEN_VAL_D_FMT = '{"d":%s}'


def encode_open_protocol(df: DataFrame,
                         key_col: str = "key", value_col: str = "value") -> DataFrame:
    """E2: open-protocol (key, value) JSON pair per change row.

    Key carries (commitTs, schema, table, type=1=row); value carries
    ``u`` (after) / ``p`` (pre/before for updates) / ``d`` (delete image)
    exactly as ``open/codec.go:24-72`` lays out.
    """
    key = F.format_string(
        _OPEN_KEY_FMT, F.col("commit_ts"), F.col("schema_name"), F.col("table_name")
    )
    value = (
        F.when(F.col("op") == "U",
               F.format_string(_OPEN_VAL_U_FMT, F.col("after"), F.col("before")))
        .when(F.col("op") == "I", F.format_string(_OPEN_VAL_I_FMT, F.col("after")))
        .otherwise(F.format_string(_OPEN_VAL_D_FMT, F.col("before")))
    )
    return df.withColumn(key_col, key).withColumn(value_col, value)


_CANAL_MSG_SCHEMA = (
    "id BIGINT, database STRING, table STRING, pkNames ARRAY<STRING>, "
    "isDdl BOOLEAN, type STRING, es BIGINT, ts BIGINT, sql STRING, "
    "data ARRAY<STRUCT<pk BIGINT, event_type STRING, value_cents BIGINT, user_id BIGINT>>, "
    "old ARRAY<STRUCT<pk BIGINT, event_type STRING, value_cents BIGINT, user_id BIGINT>>, "
    "_tidb STRUCT<commitTs BIGINT>"
)


def decode_canal_json(df: DataFrame, msg_col: str = "message") -> DataFrame:
    """E7: consumer-side canal-json decoder
    (``pkg/sink/codec/decoder/decoder.go``,
    ``canal/canal_json_message.go``) — ``from_json`` back into typed
    change columns; the encode→decode round trip is loss-free for the
    fields the protocol carries."""
    parsed = df.withColumn("m", F.from_json(F.col(msg_col), _CANAL_MSG_SCHEMA))
    return parsed.select(
        "seq",
        F.col("m.database").alias("database"),
        F.col("m.table").alias("table_name"),
        F.col("m.type").alias("canal_type"),
        F.col("m.es").alias("es"),
        F.col("m._tidb.commitTs").alias("commit_ts"),
        F.expr("m.data[0].pk").alias("pk"),
        F.expr("m.data[0].event_type").alias("event_type"),
        F.expr("m.data[0].value_cents").alias("value_cents"),
        F.expr("m.old[0].value_cents").alias("old_value_cents"),
    )


def decode_canal_for_apply(df: DataFrame, msg_col: str = "message",
                           offset_col: str = "seq") -> DataFrame:
    """Consumer-side decode into the APPLY shape — the kafka-consumer
    binary's pipeline (``cmd_kafka_consumer`` in the reference's
    integration tests: decode canal-json from the topic, apply to the
    downstream with safe-mode): message bytes → the canonical change
    columns a sink merges on.

    What the protocol carries vs what apply needs:

    - ``table_id`` is re-derived from the table NAME (the consumer's
      name→table mapping; upstream numeric ids are internal and never
      cross the wire) — here ``t<N>`` encodes it directly;
    - ``start_ts`` is NOT in canal-json — emitted as 0. Ordering then
      rests on ``_tidb.commitTs`` (+ the per-partition offset), exactly
      the real consumer's guarantee: canal-json consumers cannot break
      equal-commit-ts ties, which is why callers assert a tie-free
      corpus before relying on LWW equivalence;
    - ``offset_col`` plays the Kafka offset (per-partition apply order);
    - D rows carry the BEFORE image in ``data`` (canal semantics) — the
      pk routes the delete; payload fields are never read for a D.
    """
    parsed = df.withColumn("m", F.from_json(F.col(msg_col), _CANAL_MSG_SCHEMA))
    return parsed.select(
        F.col("m.database").alias("schema_name"),
        F.col("m.table").alias("table_name"),
        F.expr("cast(substring(m.table, 2) as bigint)").alias("table_id"),
        F.when(F.col("m.type") == "INSERT", "I")
        .when(F.col("m.type") == "UPDATE", "U")
        .otherwise("D").alias("op"),
        F.lit(0).cast("bigint").alias("start_ts"),
        F.col("m._tidb.commitTs").alias("commit_ts"),
        F.col(offset_col).cast("bigint").alias("seq"),
        F.expr("m.data[0].pk").alias("pk"),
        F.expr("m.data[0].event_type").alias("event_type"),
        F.expr("m.data[0].value_cents").alias("value_cents"),
        F.expr("m.data[0].user_id").alias("user_id"),
    )


def decode_open_for_apply(df: DataFrame, key_col: str = "key",
                          value_col: str = "value",
                          offset_col: str = "seq") -> DataFrame:
    """Consumer-side decode of OPEN-PROTOCOL key/value messages into the
    apply shape — the kafka-consumer binary wired for ProtocolOpen (the
    reference's consumer decodes every protocol its sink encodes). The
    op is inferred from which images the value carries (the open codec's
    own convention, ``pkg/sink/codec/open``): u+p → UPDATE, u alone →
    INSERT, d alone → DELETE. Like canal-json, start_ts is not on the
    wire (emitted 0) — LWW correctness rests on a commit-ts tie-free
    corpus, the same precondition callers assert for the canal consumer.
    table_id is re-derived from the table NAME in the key (consumer-side
    name→id mapping); D rows surface the before image's payload fields
    (only the pk routes a delete)."""
    img = ("STRUCT<pk BIGINT, event_type STRING, value_cents BIGINT, "
           "user_id BIGINT>")
    k = F.from_json(F.col(key_col),
                    "ts BIGINT, scm STRING, tbl STRING, t BIGINT")
    v = F.from_json(F.col(value_col), f"u {img}, p {img}, d {img}")
    parsed = df.select(F.col(offset_col), k.alias("k"), v.alias("v"))
    op = (
        F.when(F.col("v.u").isNotNull() & F.col("v.p").isNotNull(), "U")
        .when(F.col("v.u").isNotNull(), "I")
        .otherwise("D")
    )
    live = F.when(op == "D", F.col("v.d")).otherwise(F.col("v.u"))
    return parsed.select(
        F.col("k.scm").alias("schema_name"),
        F.col("k.tbl").alias("table_name"),
        F.expr("cast(substring(k.tbl, 2) as bigint)").alias("table_id"),
        op.alias("op"),
        F.lit(0).cast("bigint").alias("start_ts"),
        F.col("k.ts").alias("commit_ts"),
        F.col(offset_col).cast("bigint").alias("seq"),
        live.getField("pk").alias("pk"),
        live.getField("event_type").alias("event_type"),
        live.getField("value_cents").alias("value_cents"),
        live.getField("user_id").alias("user_id"),
    )


#: claim-check pointer layout (pkg/sink/kafka/claimcheck/claim_check.go —
#: the MQ message is replaced by a location pointer; the payload goes to
#: object storage)
_CLAIM_FMT = '{"claimCheckLocation":"s3://claim-check/%s.json"}'


def claim_check(df: DataFrame, threshold: int,
                msg_col: str = "message",
                value_is_hex: bool = False) -> DataFrame:
    """E5: large-message offload — messages over ``threshold`` bytes are
    replaced by a deterministic object-storage pointer (md5-addressed);
    the side-write of the payload itself is the sink's `foreachBatch`
    job (here represented by the address column).

    ``value_is_hex``: a compressed open-protocol value rides as HEX
    (2 chars/byte) — the reference sizes the COMPRESSED wire
    (``open/codec.go:85``), so the threshold compares against
    ``octet_length/2`` there, mirroring the ErrMessageTooLarge guard."""
    size = F.octet_length(F.col(msg_col))
    if value_is_hex:
        size = size / 2
    oversized = size > threshold
    return (
        df.withColumn("offloaded", oversized)
        .withColumn(
            "claim_addr",
            F.when(oversized, F.format_string(_CLAIM_FMT, F.md5(F.col(msg_col)))),
        )
        .withColumn(
            "wire_value",
            F.when(oversized, F.col("claim_addr")).otherwise(F.col(msg_col)),
        )
    )


#: reference default max-batch-size (config MaxBatchSize; the encoder
#: rolls a new message when the current batch hits it, open/encoder.go:122)
OPEN_MAX_BATCH_SIZE = 1024


def _with_batch_seq(df: DataFrame, max_batch_size: int):
    """Split each (topic, partition) lane into ≤max_batch_size batches in
    seq order — bounds the per-group state the batch aggregation collects
    (one unbounded lane would otherwise accumulate a whole topic's history
    into a single array row at scale)."""
    from pyspark.sql import Window

    w = Window.partitionBy("topic", "partition").orderBy("seq")
    # integer div, not float: (rn-1)/N round-trips through double and is
    # only exact while per-lane row_number < 2^53.
    return (
        df.withColumn("_rn0", (F.row_number().over(w) - 1).cast("bigint"))
        .withColumn("batch_seq", F.expr(f"_rn0 div {int(max_batch_size)}"))
        .drop("_rn0")
    )


def encode_open_protocol_batch(df: DataFrame, sep: str = "\n",
                               max_batch_size: int = OPEN_MAX_BATCH_SIZE) -> DataFrame:
    """E4: message batching — framed batches per ``(topic, partition)``,
    messages in seq order, rolled at ``max_batch_size``
    (``kafka_dml_worker.go:221-321``: accumulate, group by
    topic-partition, flush; MaxBatchSize roll ``open/encoder.go:122``).
    The reference frames with uint64 lengths; a separator-framed text
    batch keeps the same grouping/order semantics and stays
    oracle-checkable (:func:`encode_open_batch_framed` is the
    byte-compatible form)."""
    return (
        _with_batch_seq(df, max_batch_size)
        .groupBy("topic", "partition", "batch_seq")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("seq"), F.col("value")))
                    ),
                    lambda s: s["value"],
                ),
                sep,
            ).alias("batch_value"),
            F.count(F.lit(1)).alias("n_messages"),
            F.max("seq").alias("max_seq"),
        )
    )


_DBZ_SOURCE_FMT = (
    '{"version":"2.4.0.Final","connector":"TiCDC","name":"%s",'
    '"ts_ms":%d,"snapshot":"false","db":"%s","table":"%s",'
    '"server_id":0,"gtid":null,"file":"","pos":0,"row":0,"thread":0,'
    '"query":null,"commit_ts":%d,"cluster_id":"%s"}'
)
_DBZ_FMT = '{"payload":{"source":%s,"ts_ms":%d,"transaction":null,"op":"%s",%s}}'


def encode_debezium(df: DataFrame, cluster_id: str = "default",
                    out_col: str = "message") -> DataFrame:
    """Debezium-envelope encoder (in-tree but unwired in the reference —
    ``pkg/sink/codec/debezium/codec.go:525-600``, commented out of
    ``encoder_builder.go:24-25``; implemented here so the engine covers
    the full in-tree codec surface).

    Field layout mirrors the reference: ``payload.source`` carries the
    connector metadata + TiDB extensions (``commit_ts``, ``cluster_id``);
    ``op`` is c/u/d; before/after images per op. The reference stamps the
    envelope ``ts_ms`` with processing wall-clock (``nowFunc``) — here it
    is the commit millisecond, keeping the message replay-deterministic
    (same rationale as the claim-check addressing).
    """
    source = F.format_string(
        _DBZ_SOURCE_FMT,
        F.lit(cluster_id),
        F.expr("commit_ts div 1000"),
        F.col("schema_name"),
        F.col("table_name"),
        F.col("commit_ts"),
        F.lit(cluster_id),
    )
    op = (
        F.when(F.col("op") == "I", F.lit("c"))
        .when(F.col("op") == "U", F.lit("u"))
        .otherwise(F.lit("d"))
    )
    images = (
        F.when(F.col("op") == "I",
               F.format_string('"before":null,"after":%s', F.col("after")))
        .when(F.col("op") == "U",
              F.format_string('"before":%s,"after":%s',
                              F.col("before"), F.col("after")))
        .otherwise(F.format_string('"before":%s,"after":null', F.col("before")))
    )
    msg = F.format_string(
        _DBZ_FMT, source, F.expr("commit_ts div 1000"), op, images
    )
    return df.withColumn(out_col, msg)


def encode_csv_rows(df: DataFrame, out_col: str = "line") -> DataFrame:
    """CSV line encoder (storage-sink style): one delimited line per
    change — ``op, schema, table, commit_ts, pk, event_type, value_cents``
    with NULLs rendered ``\\N`` (the MySQL dump convention the reference's
    type renderer follows, ``pkg/common/helper.go:19-80``).
    """
    cols = [
        F.col("op"), F.col("schema_name"), F.col("table_name"),
        F.col("commit_ts").cast("string"), F.col("pk").cast("string"),
        F.col("event_type"), F.col("value_cents").cast("string"),
    ]
    rendered = [F.coalesce(c, F.lit("\\N")) for c in cols]
    return df.withColumn(out_col, F.concat_ws(",", *rendered))


_SIMPLE_PREFIX_FMT = (
    '{"version":1,"database":"%s","table":"%s","tableID":%d,"type":"DML",'
    '"commitTs":%d,"buildTs":%d,"schemaVersion":1'
)


def encode_simple_protocol(df: DataFrame, out_col: str = "message") -> DataFrame:
    """Simple-protocol encoder (in-tree but unwired in the reference —
    ``pkg/sink/codec/simple/message.go:475-505``, commented out of
    ``encoder_builder.go:26-27``): versioned row message with
    ``data``/``old`` images per op (``omitempty`` — insert carries data
    only, update both, delete old only). ``buildTs`` is wall-clock in the
    reference (``time.Now``); pinned to the commit millisecond here so
    messages are replay-deterministic.
    """
    prefix = F.format_string(
        _SIMPLE_PREFIX_FMT,
        F.col("schema_name"), F.col("table_name"), F.col("table_id"),
        F.col("commit_ts"), F.expr("commit_ts div 1000"),
    )
    tail = (
        F.when(F.col("op") == "I",
               F.format_string(',"data":%s}', F.col("after")))
        .when(F.col("op") == "U",
              F.format_string(',"data":%s,"old":%s}',
                              F.col("after"), F.col("before")))
        .otherwise(F.format_string(',"old":%s}', F.col("before")))
    )
    return df.withColumn(out_col, F.concat(prefix, tail))


_DBZ_MSG_SCHEMA = (
    "STRUCT<payload: STRUCT<"
    "source: STRUCT<db: STRING, `table`: STRING, commit_ts: BIGINT, cluster_id: STRING>, "
    "ts_ms: BIGINT, op: STRING, "
    "before: STRUCT<pk: BIGINT, event_type: STRING, value_cents: BIGINT>, "
    "after: STRUCT<pk: BIGINT, event_type: STRING, value_cents: BIGINT>>>"
)


def decode_debezium(df: DataFrame, msg_col: str = "message") -> DataFrame:
    """E7 for the debezium envelope: ``from_json`` back into typed change
    columns (consumer side of :func:`encode_debezium`; the reference
    ships decoders for its integration-test consumers,
    ``pkg/sink/codec/decoder/decoder.go``). c/u/d maps back to I/U/D; the
    effective image is after for c/u, before for d."""
    parsed = df.withColumn("m", F.from_json(F.col(msg_col), _DBZ_MSG_SCHEMA))
    op = (
        F.when(F.col("m.payload.op") == "c", "I")
        .when(F.col("m.payload.op") == "u", "U")
        .otherwise(F.lit("D"))
    )
    img = F.when(
        F.col("m.payload.op") == "d", F.col("m.payload.before")
    ).otherwise(F.col("m.payload.after"))
    return parsed.select(
        "seq",
        F.col("m.payload.source.db").alias("database"),
        F.col("m.payload.source.table").alias("table_name"),
        op.alias("op"),
        F.col("m.payload.source.commit_ts").alias("commit_ts"),
        img["pk"].alias("pk"),
        img["event_type"].alias("event_type"),
        img["value_cents"].alias("value_cents"),
    )


def decode_csv_rows(df: DataFrame, line_col: str = "line") -> DataFrame:
    """E7 for the storage-sink CSV line format: split back into typed
    change columns (consumer side of :func:`encode_csv_rows`, the
    reference's ``run_storage_consumer`` path). ``\\N`` unmaps to NULL."""
    parts = F.split(F.col(line_col), ",")

    def field(i: int):
        v = parts.getItem(i)
        return F.when(v == "\\N", F.lit(None).cast("string")).otherwise(v)

    return df.select(
        field(0).alias("op"),
        field(1).alias("schema_name"),
        field(2).alias("table_name"),
        field(3).cast("bigint").alias("commit_ts"),
        field(4).cast("bigint").alias("pk"),
        field(5).alias("event_type"),
        field(6).cast("bigint").alias("value_cents"),
    )


#: storage csv row layout (public TiCDC csv format): op flag first,
#: then the table identity, optionally the commit ts, then the columns
_CSV_FIELDS = ("op", "schema_name", "table_name", "pk", "event_type",
               "value_cents")


def encode_csv_configured(df: DataFrame, cfg, out_col: str = "line",
                          extra_cols: tuple[str, ...] = ()) -> DataFrame:
    """CSV line encoder honoring the reference's CSVConfig knobs
    (``pkg/config/sink.go:250-268``): ``delimiter`` / ``quote`` /
    ``null`` / ``include-commit-ts`` / ``binary-encoding-method``.
    Spark-first: ``F.to_csv`` with the matching writer options — the
    JVM csv writer quotes exactly when a field contains the quote char,
    the delimiter, or a line break (and backslash-escapes quote/escape
    chars inside quoted fields), so the wire bytes are the engine's,
    not a reimplementation. BinaryType columns in ``extra_cols`` are
    rendered per ``binary_encoding_method`` before the csv assembly
    (the codec's BLOB rule)."""
    from pyspark.sql.types import BinaryType

    cfg.validate()
    cols = list(_CSV_FIELDS[:3])
    if cfg.include_commit_ts:
        cols.append("commit_ts")
    cols += list(_CSV_FIELDS[3:]) + list(extra_cols)
    rendered = []
    for c in cols:
        if isinstance(df.schema[c].dataType, BinaryType):
            f = F.hex(F.col(c)) if cfg.binary_encoding_method == "hex" \
                else F.base64(F.col(c))
        else:
            f = F.col(c).cast("string")
        rendered.append(f.alias(c))
    if not cfg.quote:
        # quoting DISABLED (empty quote is a valid reference config):
        # plain join, no quote char on the wire at all — a field
        # containing the delimiter is unrepresentable in this dialect
        # (the reference's quote-less csv has the same ambiguity).
        # Spark's to_csv has no true off switch (quote='' maps to a
        # NUL quote char that still wraps such fields), so this lane
        # renders via concat explicitly.
        parts = [F.coalesce(r, F.lit(cfg.null_string)) for r in rendered]
        joined = parts[0]
        for p in parts[1:]:
            joined = F.concat(joined, F.lit(cfg.delimiter), p)
        return df.withColumn(out_col, joined)
    opts = {"sep": cfg.delimiter, "nullValue": cfg.null_string,
            "quote": cfg.quote}
    return df.withColumn(out_col, F.to_csv(F.struct(*rendered), opts))


def decode_csv_configured(df: DataFrame, cfg,
                          line_col: str = "line",
                          extra_schema: str = "") -> DataFrame:
    """Consumer-side inverse of :func:`encode_csv_configured` —
    ``F.from_csv`` with the same options (quote-aware, so a delimiter
    inside a quoted field survives, which a naive split cannot do)."""
    cfg.validate()
    fields = ["op string", "schema_name string", "table_name string"]
    if cfg.include_commit_ts:
        fields.append("commit_ts bigint")
    fields += ["pk bigint", "event_type string", "value_cents bigint"]
    if extra_schema:
        fields.append(extra_schema)
    keep = [c for c in df.columns if c != line_col]
    if not cfg.quote:
        # quote-less dialect: plain positional split (the encode lane's
        # inverse; no quote char can appear on this wire)
        parts = F.split(F.col(line_col), _regex_escape(cfg.delimiter))
        outs = []
        for i, fdef in enumerate(fields):
            name, typ = fdef.split(" ", 1)
            v = parts.getItem(i)
            v = F.when(v == cfg.null_string, F.lit(None)).otherwise(v)
            outs.append(v.cast(typ).alias(name))
        return df.select(*keep, *outs)
    opts = {"sep": cfg.delimiter, "nullValue": cfg.null_string,
            "quote": cfg.quote}
    m = F.from_csv(F.col(line_col), ", ".join(fields), opts)
    return df.withColumn("m", m).select(*keep, "m.*")


def _regex_escape(s: str) -> str:
    import re as _re

    return _re.escape(s)


def decode_csv_for_apply(df: DataFrame, line_col: str = "line") -> DataFrame:
    """Consumer-side decode of storage-sink CSV lines into the APPLY
    shape — the ``run_storage_consumer`` pipeline (the reference's
    storage consumer binary, driven by every csv_storage_* integration
    test: tail the dated file tree, decode lines, apply downstream).
    Same reconstruction contract as the MQ consumers: ``table_id``
    re-derived from the table name, ``start_ts`` not on the wire
    (emitted 0 — LWW needs the commit-ts tie-free precondition), and the
    file tree carries no per-row offset, so ``seq`` is 0 (ties within a
    commit ts are exactly what the precondition excludes)."""
    base = decode_csv_rows(df, line_col=line_col)
    return base.select(
        "schema_name", "table_name",
        F.expr("cast(substring(table_name, 2) as bigint)").alias("table_id"),
        "op",
        F.lit(0).cast("bigint").alias("start_ts"),
        "commit_ts",
        F.lit(0).cast("bigint").alias("seq"),
        "pk", "event_type", "value_cents",
    )


_SIMPLE_MSG_SCHEMA = (
    "STRUCT<version: INT, `database`: STRING, `table`: STRING, tableID: BIGINT, "
    "type: STRING, commitTs: BIGINT, buildTs: BIGINT, schemaVersion: INT, "
    "claimCheckLocation: STRING, handleKeyOnly: BOOLEAN, "
    "data: STRUCT<pk: BIGINT, event_type: STRING, value_cents: BIGINT>, "
    "old: STRUCT<pk: BIGINT, event_type: STRING, value_cents: BIGINT>>"
)


def encode_simple_protocol_large(df: DataFrame, threshold: int,
                                 handle: str = "claim-check",
                                 out_col: str = "message") -> DataFrame:
    """Simple-protocol JSON large-message lanes (``simple/message.go:
    488-492`` — ``claimCheckLocation``/``handleKeyOnly`` omitempty
    fields; encoder flow ``simple/encoder.go:84-120``; scenarios
    ``kafka_simple_claim_check`` / ``kafka_simple_handle_key_only``,
    the JSON siblings of the Avro lanes): a message over ``threshold``
    bytes re-renders with pk-only images and ``handleKeyOnly:true``,
    plus — for ``handle='claim-check'`` — the md5-addressed
    ``claimCheckLocation`` of the offloaded full message. Adds
    ``offloaded`` (0/1) and ``claim_addr`` columns."""
    assert handle in ("claim-check", "handle-key-only")
    full = encode_simple_protocol(df, out_col="_full_msg")
    prefix = F.format_string(
        _SIMPLE_PREFIX_FMT,
        F.col("schema_name"), F.col("table_name"), F.col("table_id"),
        F.col("commit_ts"), F.expr("commit_ts div 1000"))
    loc = F.format_string("s3://claim-check/%s.json",
                          F.md5(F.col("_full_msg")))
    cc = (F.format_string(',"claimCheckLocation":"%s"', loc)
          if handle == "claim-check" else F.lit(""))
    img = F.format_string('{"pk":%d}', F.col("pk"))
    tail = (
        F.when(F.col("op") == "I", F.format_string(',"data":%s}', img))
        .when(F.col("op") == "U",
              F.format_string(',"data":%s,"old":%s}', img, img))
        .otherwise(F.format_string(',"old":%s}', img))
    )
    degraded = F.concat(prefix, cc, F.lit(',"handleKeyOnly":true'), tail)
    oversized = F.octet_length(F.col("_full_msg")) > threshold
    return full.withColumn(
        "offloaded", oversized.cast("bigint")
    ).withColumn(
        "claim_addr",
        F.when(oversized, loc) if handle == "claim-check"
        else F.lit(None).cast("string"),
    ).withColumn(
        out_col, F.when(oversized, degraded).otherwise(F.col("_full_msg"))
    ).withColumnRenamed("_full_msg", "full_message")


def decode_simple_protocol_large(df: DataFrame,
                                 msg_col: str = "message",
                                 keep: tuple[str, ...] = ()) -> DataFrame:
    """Consumer for the simple-JSON large-message wire (``decoder.go:
    141-147`` order: claim-check location first, then handleKeyOnly):
    degraded rows surface pk-only with ``only_handle_key=1`` and their
    ``claim_location`` for the fetch-back; full rows surface their
    image. ``keep`` passes wire-side columns (e.g. an offset) through."""
    parsed = df.withColumn("m", F.from_json(F.col(msg_col),
                                            _SIMPLE_MSG_SCHEMA))
    has_data = F.col("m.data").isNotNull()
    has_old = F.col("m.old").isNotNull()
    op = (
        F.when(has_data & has_old, "U")
        .when(has_data, F.lit("I"))
        .otherwise(F.lit("D"))
    )
    img = F.when(has_data, F.col("m.data")).otherwise(F.col("m.old"))
    degraded = F.coalesce(F.col("m.handleKeyOnly"), F.lit(False))
    return parsed.select(
        *[F.col(c) for c in keep],
        F.col("m.database").alias("database"),
        F.col("m.table").alias("table_name"),
        F.col("m.tableID").alias("table_id"),
        op.alias("op"),
        F.col("m.commitTs").alias("commit_ts"),
        degraded.cast("bigint").alias("only_handle_key"),
        F.col("m.claimCheckLocation").alias("claim_location"),
        img["pk"].alias("pk"),
        F.when(degraded, F.lit(None).cast("string"))
        .otherwise(img["event_type"]).alias("event_type"),
        F.when(degraded, F.lit(None).cast("bigint"))
        .otherwise(img["value_cents"]).alias("value_cents"),
    )


def decode_simple_protocol(df: DataFrame, msg_col: str = "message",
                           keep: tuple[str, ...] = ()) -> DataFrame:
    """E7 for the simple protocol: consumer-side decode of
    :func:`encode_simple_protocol` (``pkg/sink/codec/simple``'s decoder
    counterpart). Op is inferred from image presence exactly as the
    protocol defines it (omitempty): data only → INSERT, data+old →
    UPDATE, old only → DELETE; the effective image is data for I/U,
    old for D."""
    parsed = df.withColumn("m", F.from_json(F.col(msg_col), _SIMPLE_MSG_SCHEMA))
    has_data = F.col("m.data").isNotNull()
    has_old = F.col("m.old").isNotNull()
    op = (
        F.when(has_data & has_old, "U")
        .when(has_data, F.lit("I"))
        .otherwise(F.lit("D"))
    )
    img = F.when(has_data, F.col("m.data")).otherwise(F.col("m.old"))
    return parsed.select(
        *[F.col(c) for c in keep],
        F.col("m.database").alias("database"),
        F.col("m.table").alias("table_name"),
        F.col("m.tableID").alias("table_id"),
        op.alias("op"),
        F.col("m.commitTs").alias("commit_ts"),
        img["pk"].alias("pk"),
        img["event_type"].alias("event_type"),
        img["value_cents"].alias("value_cents"),
    )


#: tableSchema payload fragments for the engine's logical tables — the
#: column set every app.tN table carries (columnSchema/dataType layout:
#: ``pkg/sink/codec/simple/message.go:105-128``; index layout ``:223-229``).
_BOOTSTRAP_COLS_JSON = (
    '[{"name":"pk","dataType":{"mysqlType":"bigint","charset":"binary",'
    '"collate":"binary"},"nullable":false,"default":null},'
    '{"name":"event_type","dataType":{"mysqlType":"varchar(255)",'
    '"charset":"utf8mb4","collate":"utf8mb4_bin"},"nullable":true,"default":null},'
    '{"name":"value_cents","dataType":{"mysqlType":"bigint","charset":"binary",'
    '"collate":"binary"},"nullable":true,"default":null},'
    '{"name":"user_id","dataType":{"mysqlType":"bigint","charset":"binary",'
    '"collate":"binary"},"nullable":true,"default":null}]'
)
_BOOTSTRAP_IDX_JSON = (
    '[{"name":"primary","unique":true,"primary":true,"nullable":false,'
    '"columns":["pk"]}]'
)

_BOOTSTRAP_FMT = (
    '{"version":1,"database":"%s","table":"%s","tableID":%d,"type":"BOOTSTRAP",'
    '"commitTs":%d,"buildTs":%d,"tableSchema":{"schema":"%s","table":"%s",'
    '"tableID":%d,"version":1,"columns":' + _BOOTSTRAP_COLS_JSON
    + ',"indexes":' + _BOOTSTRAP_IDX_JSON + "}}"
)


def json_escape(col: Column) -> Column:
    """JSON string-escape a column interpolated into a format_string JSON
    literal: backslash, double-quote, and the common control chars. A raw
    ``"`` or ``\\`` in a DDL statement or identifier would otherwise
    produce invalid JSON. Literal replaces (no regex); the DuckDB oracles
    mirror the same replace chain (``_json_esc_sql`` in catalog.py)."""
    c = F.replace(col, F.lit("\\"), F.lit("\\\\"))
    c = F.replace(c, F.lit('"'), F.lit('\\"'))
    c = F.replace(c, F.lit("\n"), F.lit("\\n"))
    c = F.replace(c, F.lit("\r"), F.lit("\\r"))
    c = F.replace(c, F.lit("\t"), F.lit("\\t"))
    return c


def encode_simple_bootstrap(ch: DataFrame, out_col: str = "message") -> DataFrame:
    """Simple-protocol BOOTSTRAP messages — the per-table schema handshake a
    consumer needs before it can interpret DML (``pkg/sink/codec/
    bootstraper.go:39-100`` sends one per active table; message shape
    ``simple/message.go:517-530`` with the ``TableSchema`` payload
    ``:276-307``). One message per logical table; ``commitTs`` is the
    table's first change ts (the bootstrap snapshot point) and ``buildTs``
    is pinned to its millisecond for replay determinism (wall-clock in the
    reference).
    """
    tables = ch.groupBy("schema_name", "table_name", "table_id").agg(
        F.min("commit_ts").alias("commit_ts")
    )
    esc_s, esc_t = json_escape(F.col("schema_name")), json_escape(F.col("table_name"))
    msg = F.format_string(
        _BOOTSTRAP_FMT,
        esc_s, esc_t, F.col("table_id"),
        F.col("commit_ts"), F.expr("commit_ts div 1000"),
        esc_s, esc_t, F.col("table_id"),
    )
    return tables.withColumn(out_col, msg)


_BOOTSTRAP_MSG_SCHEMA = (
    "STRUCT<version: INT, `database`: STRING, `table`: STRING, tableID: BIGINT, "
    "type: STRING, commitTs: BIGINT, buildTs: BIGINT, "
    "tableSchema: STRUCT<schema: STRING, `table`: STRING, tableID: BIGINT, "
    "version: BIGINT, "
    "columns: ARRAY<STRUCT<name: STRING, dataType: STRUCT<mysqlType: STRING, "
    "charset: STRING, collate: STRING>, nullable: BOOLEAN, `default`: STRING>>, "
    "indexes: ARRAY<STRUCT<name: STRING, `unique`: BOOLEAN, `primary`: BOOLEAN, "
    "nullable: BOOLEAN, columns: ARRAY<STRING>>>>>"
)


def decode_simple_bootstrap(df: DataFrame, msg_col: str = "message") -> DataFrame:
    """Consumer side of :func:`encode_simple_bootstrap`: parse the
    tableSchema handshake back into the typed registry row a consumer
    builds before decoding DML (columns list, schema version, primary-key
    column set)."""
    parsed = df.withColumn("m", F.from_json(F.col(msg_col), _BOOTSTRAP_MSG_SCHEMA))
    pk_cols = F.expr(
        "array_join(flatten(transform("
        "filter(m.tableSchema.indexes, i -> i.primary), i -> i.columns)), ',')"
    )
    return parsed.select(
        F.col("m.database").alias("database"),
        F.col("m.table").alias("table_name"),
        F.col("m.tableID").alias("table_id"),
        F.col("m.type").alias("msg_type"),
        F.col("m.commitTs").alias("commit_ts"),
        F.col("m.tableSchema.version").alias("schema_version"),
        F.expr("cast(size(m.tableSchema.columns) as bigint)").alias("n_columns"),
        F.expr(
            "array_join(transform(m.tableSchema.columns, c -> c.name), ',')"
        ).alias("column_names"),
        pk_cols.alias("pk_columns"),
    )


#: Avro JSON-encoding of the row record (field layout
#: ``pkg/sink/codec/avro/arvo.go:163-205,328-343,505-540``): nullable
#: columns are ["null", T] unions — the Avro JSON encoding renders a
#: non-null union value as {"type": value} (Avro spec §JSON encoding) —
#: while the non-null handle key (pk) stays plain; TiDB extension fields
#: _tidb_op ("c"/"u", arvo.go:314-325), _tidb_commit_ts, and
#: _tidb_commit_physical_time ride along. The reference frames the
#: payload as Confluent binary (magic byte + schema id + Avro binary);
#: the engine keeps the JSON encoding of the same record — schema
#: registration and binary framing are transport concerns the Kafka
#: stand-in doesn't model.
_AVRO_VALUE_FMT = (
    '{"pk":%d,"event_type":{"string":"%s"},"value_cents":{"long":%d},'
    '"user_id":{"long":%d},"_tidb_op":"%s","_tidb_commit_ts":%d,'
    '"_tidb_commit_physical_time":%d}'
)
_AVRO_KEY_FMT = '{"pk":%d}'


def encode_avro_json(df: DataFrame, key_col: str = "key",
                     value_col: str = "value") -> DataFrame:
    """Avro codec (E-family): key = handle-key record, value = row record
    with TiDB extension fields, JSON-encoded.

    Deletes produce a **null value** (``arvo.go:163-166`` returns nil —
    the Kafka tombstone convention; the consumer infers the delete from
    the null payload and takes the key from the key record). Physical
    time is the commit millisecond (stand-in for TSO physical extraction,
    ``oracle.ExtractPhysical``).
    """
    op = F.when(F.col("op") == "I", "c").otherwise(F.lit("u"))
    value = F.when(
        F.col("op") != "D",
        F.format_string(
            _AVRO_VALUE_FMT,
            F.col("pk"), F.col("event_type"), F.col("value_cents"),
            F.col("user_id"), op, F.col("commit_ts"),
            F.expr("commit_ts div 1000"),
        ),
    )
    key = F.format_string(_AVRO_KEY_FMT, F.col("pk"))
    return df.withColumn(key_col, key).withColumn(value_col, value)


_AVRO_VALUE_SCHEMA = (
    "STRUCT<pk: BIGINT, event_type: STRUCT<string: STRING>, "
    "value_cents: STRUCT<long: BIGINT>, user_id: STRUCT<long: BIGINT>, "
    "_tidb_op: STRING, _tidb_commit_ts: BIGINT, "
    "_tidb_commit_physical_time: BIGINT>"
)


def decode_avro_json(df: DataFrame, key_col: str = "key",
                     value_col: str = "value") -> DataFrame:
    """Consumer side of :func:`encode_avro_json`: a null value is a delete
    tombstone (pk from the key record); otherwise _tidb_op c/u maps back
    to I/U and the union-wrapped columns unwrap."""
    parsed = df.withColumn(
        "v", F.from_json(F.col(value_col), _AVRO_VALUE_SCHEMA)
    ).withColumn("k", F.from_json(F.col(key_col), "STRUCT<pk: BIGINT>"))
    is_del = F.col(value_col).isNull()
    return parsed.select(
        F.col("seq"),
        F.when(is_del, "D")
        .when(F.col("v._tidb_op") == "c", "I")
        .otherwise(F.lit("U"))
        .alias("op"),
        F.when(is_del, F.col("k.pk")).otherwise(F.col("v.pk")).alias("pk"),
        F.col("v._tidb_commit_ts").alias("commit_ts"),
        F.col("v.event_type.string").alias("event_type"),
        F.col("v.value_cents.long").alias("value_cents"),
        F.col("v.user_id.long").alias("user_id"),
    )


def encode_open_batch_framed(df: DataFrame,
                             max_batch_size: int = OPEN_MAX_BATCH_SIZE,
                             value_is_hex: bool = False) -> DataFrame:
    """E2 binary batch framing — the open-protocol wire format
    (``pkg/sink/codec/open/encoder.go:113-152``):

    - message key   = ``[8B BE BatchVersion1=1]`` + per row
      ``[8B BE keyLen][key bytes]``
    - message value = per row ``[8B BE valueLen][value bytes]``

    Frames roll at ``max_batch_size`` rows per (topic, partition) lane in
    seq order (``open/encoder.go:122``; size-based rolling is the other
    half of that predicate). Frames are built as hex strings JVM-side
    (hex is the cross-engine-stable rendering; ``unhex`` of the columns is
    the byte payload a Kafka producer would send) — length prefixes use
    octet_length, so non-ASCII payloads frame correctly. Expects columns
    (topic, partition, seq, key, value).

    ``value_is_hex=True`` means the value column already holds HEX of raw
    bytes (e.g. a compressed value, ``open/codec.go:85`` — compression
    runs BEFORE framing, so the length prefix counts compressed bytes);
    the frame embeds it verbatim with length = len/2.
    """
    grouped = _with_batch_seq(df, max_batch_size).groupBy(
        "topic", "partition", "batch_seq"
    ).agg(
        F.expr("array_sort(collect_list(struct(seq, key, value)))").alias("ms")
    )
    key_hex = F.expr(
        "concat('0000000000000001', array_join(transform(ms, m -> "
        "concat(lpad(hex(octet_length(m.key)), 16, '0'), hex(m.key))), ''))"
    )
    if value_is_hex:
        value_hex = F.expr(
            "array_join(transform(ms, m -> "
            "concat(lpad(hex(length(m.value) div 2), 16, '0'), m.value)), '')"
        )
    else:
        value_hex = F.expr(
            "array_join(transform(ms, m -> "
            "concat(lpad(hex(octet_length(m.value)), 16, '0'), hex(m.value))), '')"
        )
    return grouped.select(
        "topic",
        "partition",
        "batch_seq",
        key_hex.alias("batch_key_hex"),
        value_hex.alias("batch_value_hex"),
        F.expr("cast(size(ms) as bigint)").alias("n_messages"),
        F.expr("element_at(transform(ms, m -> m.seq), -1)").alias("max_seq"),
    )


def _bin_frames_expr(col: str, n_col: str, skip_version: bool) -> str:
    """SQL: fold a length-prefixed BINARY frame stream into an array of
    per-message payload byte slices — a single JVM `aggregate` walking
    (offset, acc); no Python.

    The walk MUST run on BinaryType, not the hex string: ``substr`` on a
    string walks characters from position 0 to find the start (O(offset)
    per call → O(messages x batch_bytes) per batch — measured as
    1000-second straggler tasks at the 100x probe tier), while a binary
    slice is byte-addressed (O(slice) copy), keeping the whole parse
    O(batch_bytes)."""
    off0 = 9 if skip_version else 1  # 1-based; key stream leads with 8B version
    ln = f"cast(conv(hex(substr({col}, s.off, 8)), 16, 10) as int)"
    fold = (
        f"aggregate(sequence(1, cast({n_col} as int)), "
        f"struct(cast({off0} as int) as off, "
        f"cast(array() as array<binary>) as acc), "
        f"(s, i) -> struct(cast(s.off + 8 + {ln} as int) as off, "
        f"array_append(s.acc, substr({col}, s.off + 8, {ln}))), "
        f"s -> s.acc)"
    )
    # n=0 guard: Spark's sequence(1, 0) is DESCENDING [1, 0] — an empty
    # batch would perform two bogus frame reads instead of parsing zero
    # (unreachable from encode_open_batch_framed, but this is the public
    # consumer-side wire parser)
    return (f"CASE WHEN cast({n_col} as int) <= 0 "
            f"THEN cast(array() as array<binary>) ELSE {fold} END")


def decode_open_batch_framed(df: DataFrame,
                             key_col: str = "batch_key_hex",
                             value_col: str = "batch_value_hex",
                             n_col: str = "n_messages") -> DataFrame:
    """Consumer-side inverse of :func:`encode_open_batch_framed` — the
    open-protocol wire parser (``open/decoder.go``: read 8B BE version,
    then per message [8B BE keyLen][key] / [8B BE valueLen][value]).
    Emits one row per message: (topic, partition, batch_seq, idx,
    key STRING, value_hex) — the value stays hex so a compressed wire
    (``decompress_col``) or a plain one (``unhex`` → string) can both
    feed :func:`decode_open_for_apply`."""
    out = (
        df.withColumn("_kb", F.unhex(F.col(key_col)))
        .withColumn("_vb", F.unhex(F.col(value_col)))
        .withColumn("_keys", F.expr(_bin_frames_expr("_kb", n_col, True)))
        .withColumn("_vals", F.expr(_bin_frames_expr("_vb", n_col, False)))
        .select(
            "topic", "partition", "batch_seq",
            F.posexplode(F.arrays_zip("_keys", "_vals")).alias("idx", "kv"),
        )
    )
    return out.select(
        "topic", "partition", "batch_seq",
        F.col("idx").cast("bigint").alias("idx"),
        F.decode(F.col("kv._keys"), "UTF-8").alias("key"),
        F.hex(F.col("kv._vals")).alias("value_hex"),
    )


#: column catalog for versioned bootstrap — schema version v exposes the
#: first 2+v columns (matches schema_evolution_typed_view's evolution:
#: v0 pk+event_type, v1 +value_cents, v2 +user_id, v3 +props)
_BOOT_COL_DEFS = [
    ("pk", "bigint", "binary", "binary", "false"),
    ("event_type", "varchar(255)", "utf8mb4", "utf8mb4_bin", "true"),
    ("value_cents", "bigint", "binary", "binary", "true"),
    ("user_id", "bigint", "binary", "binary", "true"),
    ("props", "text", "utf8mb4", "utf8mb4_bin", "true"),
]


def boot_cols_json(n_cols: int) -> str:
    """columns JSON array for the first ``n_cols`` column defs."""
    return "[" + ",".join(
        '{"name":"%s","dataType":{"mysqlType":"%s","charset":"%s",'
        '"collate":"%s"},"nullable":%s,"default":null}' % d
        for d in _BOOT_COL_DEFS[:n_cols]
    ) + "]"


_BOOTSTRAP_V_PREFIX_FMT = (
    '{"version":1,"database":"%s","table":"%s","tableID":%d,"type":"BOOTSTRAP",'
    '"commitTs":%d,"buildTs":%d,"tableSchema":{"schema":"%s","table":"%s",'
    '"tableID":%d,"version":%d,"columns":'
)


def encode_simple_bootstrap_versioned(ch: DataFrame, versions: DataFrame,
                                      out_col: str = "message") -> DataFrame:
    """Versioned bootstrap series: one BOOTSTRAP tableSchema message per
    (table, schema version), the handshake stream a consumer replays to
    reconstruct schema history (``bootstraper.go`` re-sends on schema
    change; ``TableSchema.Version`` is the TiDB schema version,
    ``simple/message.go:280``). The column set grows with the version
    exactly like ``schema_evolution_typed_view``; ``commitTs`` is the
    version's effective-from ts."""
    tables = ch.select("schema_name", "table_name", "table_id").distinct()
    tv = tables.join(versions, "table_id")
    esc_s, esc_t = json_escape(F.col("schema_name")), json_escape(F.col("table_name"))
    prefix = F.format_string(
        _BOOTSTRAP_V_PREFIX_FMT,
        esc_s, esc_t, F.col("table_id"),
        F.col("version_ts"), F.expr("version_ts div 1000"),
        esc_s, esc_t, F.col("table_id"),
        F.col("version"),
    )
    cols = F.when(F.col("version") == 0, boot_cols_json(2))
    for v in range(1, 4):
        cols = cols.when(F.col("version") == v, boot_cols_json(2 + v))
    cols = cols.otherwise(F.lit(boot_cols_json(5)))
    suffix = F.lit(',"indexes":' + _BOOTSTRAP_IDX_JSON + "}}")
    return tv.withColumn(out_col, F.concat(prefix, cols, suffix))


#: simple-protocol DDL type mapping (getDDLType, simple/message.go:79-100)
_SIMPLE_DDL_TYPE = {
    "create table": "CREATE",
    "rename table": "RENAME",
    "drop table": "ERASE",
    "truncate table": "TRUNCATE",
    "add column": "ALTER",
}

_SIMPLE_TS_FMT = (
    '{"schema":"app","table":"t%d","tableID":%d,"version":1,"columns":'
    + _BOOTSTRAP_COLS_JSON + ',"indexes":' + _BOOTSTRAP_IDX_JSON + "}"
)


def encode_simple_ddl(ddl_df: DataFrame, out_col: str = "message") -> DataFrame:
    """Simple-protocol DDL messages (``simple/message.go:527-550``):
    versioned message with the DDL class (CREATE/ALTER/ERASE/TRUNCATE/
    RENAME), the raw SQL, and tableSchema/preTableSchema payloads —
    tableSchema absent for ERASE (table gone), preTableSchema absent for
    CREATE (no prior schema), both present otherwise; schema/table fields
    are omitempty on DDL like the reference. Expects the engine's DDL
    stream columns (table_id, commit_ts, seq, ddl_type, query)."""
    t = F.col("ddl_type")
    msg_type = None
    for k, v in _SIMPLE_DDL_TYPE.items():
        cond = F.when(t == k, v)
        msg_type = cond if msg_type is None else msg_type.when(t == k, v)
    msg_type = msg_type.otherwise(F.lit("ALTER"))
    ts_json = F.format_string(_SIMPLE_TS_FMT, F.col("table_id"), F.col("table_id"))
    head = F.format_string(
        '{"version":1,"type":"%s","commitTs":%d,"buildTs":%d,"sql":"%s"',
        msg_type, F.col("commit_ts"), F.expr("commit_ts div 1000"),
        json_escape(F.col("query")),
    )
    schema_part = F.when(
        t != "drop table", F.concat(F.lit(',"tableSchema":'), ts_json)
    ).otherwise(F.lit(""))
    pre_part = F.when(
        t != "create table", F.concat(F.lit(',"preTableSchema":'), ts_json)
    ).otherwise(F.lit(""))
    return ddl_df.withColumn(
        out_col, F.concat(head, schema_part, pre_part, F.lit("}"))
    )


def encode_open_resolved(df: DataFrame) -> DataFrame:
    """Open-protocol resolved-ts (checkpoint) message, byte-exact hex
    (``open/codec.go:149-178`` encodeResolvedTs / ``encoder.go:220-233``
    EncodeCheckpointEvent): key payload ``{"ts":N,"t":3}`` framed as
    [8B BE BatchVersion1][8B BE keyLen][key]; value is a bare
    [8B BE 0] length word. Expects a ``resolved_ts`` column."""
    key_json = F.format_string('{"ts":%d,"t":3}', F.col("resolved_ts"))
    key_hex = F.expr(
        "concat('0000000000000001', "
        "lpad(hex(octet_length(k)), 16, '0'), hex(k))"
    )
    return df.withColumn("k", key_json).withColumn(
        "key_hex", key_hex
    ).withColumn("value_hex", F.lit("0000000000000000")).drop("k")


#: public TiDB parser ActionType ints (pingcap/tidb parser/model/ddl.go —
#: stable wire constants; open/codec_test.go:211 shows create table → 3)
OPEN_DDL_ACTION = {
    "create table": 3,
    "drop table": 4,
    "add column": 5,
    "truncate table": 11,
    "rename table": 14,
}


def encode_open_ddl(df: DataFrame) -> DataFrame:
    """Open-protocol DDL message, byte-exact hex
    (``open/codec.go:99-158`` encodeDDLEvent): key
    ``{"ts":N,"scm":s,"tbl":t,"t":2}`` framed
    [8B BE BatchVersion1][8B BE keyLen][key]; value ``{"q":query,"t":A}``
    (A = TiDB ActionType int) framed [8B BE valueLen][value]. Expects
    columns commit_ts, schema_name, table_name, ddl_type, query."""
    action = F.lit(None).cast("bigint")
    for name, code in OPEN_DDL_ACTION.items():
        action = F.when(F.col("ddl_type") == name, code).otherwise(action)
    key_json = F.format_string(
        '{"ts":%d,"scm":"%s","tbl":"%s","t":2}',
        F.col("commit_ts"), json_escape(F.col("schema_name")),
        json_escape(F.col("table_name")),
    )
    value_json = F.format_string(
        '{"q":"%s","t":%d}', json_escape(F.col("query")), action
    )
    out = df.withColumn("k", key_json).withColumn("v", value_json)
    return out.withColumn(
        "key_hex",
        F.expr("concat('0000000000000001', "
               "lpad(hex(octet_length(k)), 16, '0'), hex(k))"),
    ).withColumn(
        "value_hex",
        F.expr("concat(lpad(hex(octet_length(v)), 16, '0'), hex(v))"),
    ).drop("k", "v")


def encode_mysql_sql(df: DataFrame, replicating_ts: int,
                     safe_mode_split: bool = False,
                     extra_cols: tuple[tuple[str, bool], ...] = ()
                     ) -> DataFrame:
    """K1: the MySQL sink's prepareDMLs SQL text surface
    (``pkg/sink/mysql/sql_builder.go:56-205``; the INSERT/REPLACE
    translate boundary ``mysql_writer.go:686-691``).

    Default form — one statement per change: INSERT for inserts past the
    replicating boundary, REPLACE before it, ``UPDATE ... WHERE pk LIMIT
    1`` / ``DELETE ... WHERE pk LIMIT 1`` otherwise; returns (seq, sql,
    args) with the arg vector as JSON.

    ``safe_mode_split=True`` — the fully idempotent replay form the
    reference uses when the upstream may repeat or reorder (safe mode +
    the P6 update split): every insert renders REPLACE and every update
    splits into DELETE (piece 1) + REPLACE (piece 2), so replaying ANY
    prefix-consistent stream converges to last-writer-wins state on a
    real SQL engine regardless of pre-existing rows; returns (seq,
    piece_no, sql, args). ``tests/test_mysql_sql_executes.py`` executes
    this form on SQLite and asserts the final state equals the engine's
    LWW materialization.

    ``extra_cols``: schema columns beyond the canonical payload as
    ``(name, is_generated)`` pairs — columns of ``df``. A GENERATED
    column is skipped from every column list, SET list, and arg vector
    (``sql_builder.go:163-166`` getArgs +
    ``table_info_helper.go:788-790`` getColumnList: the downstream
    engine computes it; sending a value would error with MySQL 3105
    "value specified for generated column"); stored extras render like
    the canonical columns — string-typed ones quoted + json-escaped
    (NULL renders as the bare JSON ``null``), numerics as digits. The
    mounted generated VALUE may ride ``df`` — it simply never reaches
    the DML, scenario ``generate_column/``.
    """
    qual = (F.col("schema_name"), F.col("table_name"))
    vc = F.coalesce(F.col("value_cents").cast("string"), F.lit("null"))
    # args render as a JSON array — escape the one free-form string field
    # so a quote/backslash in event_type cannot break the vector (the
    # SQLite replay test json.loads()-es these); oracles mirror the chain
    et = json_escape(F.col("event_type"))
    stored = [n for n, gen in extra_cols if not gen]
    names = ["pk", "event_type", "value_cents"] + stored
    col_list = ",".join(f"`{c}`" for c in names)
    marks = ",".join("?" for _ in names)
    dtypes = dict(df.dtypes)
    ex_fmts = ["%s"] * len(stored)

    def _bare_json(dtype: str) -> bool:
        # only dtypes whose string cast IS a valid bare JSON token may
        # render unquoted; everything else (string, timestamp, date,
        # interval, binary...) quotes + escapes — an unquoted
        # '1970-01-01 00:00:00' would corrupt the args vector. Exact
        # names, not prefixes: 'int' as a prefix would also match
        # 'interval day to second', whose cast ('INTERVAL ...') must
        # quote.
        return dtype in ("boolean", "tinyint", "smallint", "int",
                         "bigint", "float", "double"
                         ) or dtype.startswith("decimal(")

    ex_args = [
        F.coalesce(F.col(c).cast("string"), F.lit("null"))
        if _bare_json(dtypes.get(c, "string"))
        else F.when(F.col(c).isNull(), F.lit("null")).otherwise(
            F.concat(F.lit('"'), json_escape(F.col(c).cast("string")),
                     F.lit('"')))
        for c in stored
    ]
    replace_sql = F.format_string(
        f"REPLACE INTO `%s`.`%s` ({col_list}) VALUES ({marks})", *qual)
    delete_sql = F.format_string(
        "DELETE FROM `%s`.`%s` WHERE `pk` = ? LIMIT 1", *qual)
    row_args = F.format_string(
        "[" + ",".join(['%d', '"%s"', '%s'] + ex_fmts) + "]",
        F.col("pk"), et, vc, *ex_args)
    pk_args = F.format_string("[%d]", F.col("pk"))
    if not safe_mode_split:
        insert_sql = F.format_string(
            f"INSERT INTO `%s`.`%s` ({col_list}) VALUES ({marks})", *qual)
        set_list = ", ".join(f"`{c}` = ?" for c in names[1:])
        update_sql = F.format_string(
            f"UPDATE `%s`.`%s` SET {set_list} "
            "WHERE `pk` = ? LIMIT 1", *qual)
        sql = (
            F.when((F.col("op") == "I")
                   & (F.col("commit_ts") > replicating_ts), insert_sql)
            .when(F.col("op") == "I", replace_sql)
            .when(F.col("op") == "U", update_sql)
            .otherwise(delete_sql)
        )
        args = (
            F.when(F.col("op") == "I", row_args)
            .when(F.col("op") == "U",
                  F.format_string(
                      "[" + ",".join(['"%s"', '%s'] + ex_fmts + ['%d']) + "]",
                      et, vc, *ex_args, F.col("pk")))
            .otherwise(pk_args)
        )
        return df.select("seq", sql.alias("sql"), args.alias("args"))
    pieces = (
        F.when(F.col("op") == "U", F.array(F.lit("D"), F.lit("R")))
        .when(F.col("op") == "D", F.array(F.lit("D")))
        .otherwise(F.array(F.lit("R")))
    )
    ex = df.select(
        "*", F.posexplode(pieces).alias("piece0", "kind")
    ).withColumn("piece_no", (F.col("piece0") + 1).cast("bigint"))
    sql = F.when(F.col("kind") == "D", delete_sql).otherwise(replace_sql)
    args = F.when(F.col("kind") == "D", pk_args).otherwise(row_args)
    return ex.select(
        "seq", "piece_no", sql.alias("sql"), args.alias("args")
    )
