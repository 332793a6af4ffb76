"""Canal-JSON ``content-compatible`` mode (sink URI
``content-compatible=true``; ``common/config.go:65,262-265``;
``canal/encoder.go:260`` GetMySQLType(col, ContentCompatible);
scenarios ``canal_json_content_compatible/`` and
``canal_json_adapter_compatibility/``): full mysqlType descriptors for
the official Canal adapter, and OnlyOutputUpdatedColumns forced on so
an UPDATE's old image carries only the changed columns."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from tigate_spark.sources.changes import changes_stream


def test_content_compatible_wire_shape(spark, sf_dir):
    from tigate_spark.functions.encoders import encode_canal_json_typed

    ch = changes_stream(spark, sf_dir, with_images=True).limit(200)
    rows = encode_canal_json_typed(
        ch, content_compatible=True).select("op", "message").collect()
    saw_u = False
    for r in rows:
        m = json.loads(r["message"])
        # full type descriptors (GetTypeDesc / FieldType.CompactStr)
        assert m["mysqlType"] == {"pk": "bigint(20)",
                                  "event_type": "varchar(255)",
                                  "value_cents": "bigint(20)"}
        if r["op"] == "U":
            saw_u = True
            # only-updated columns in old (fillUpdateColumns with
            # OnlyOutputUpdatedColumns): value_cents alone changes
            assert list(m["old"][0]) == ["value_cents"]
            assert (m["old"][0]["value_cents"]
                    == m["data"][0]["value_cents"] - 100)
        else:
            assert m["old"] is None
    assert saw_u


def test_default_mode_short_mysql_types(spark, sf_dir):
    from tigate_spark.functions.encoders import encode_canal_json_typed

    ch = changes_stream(spark, sf_dir, with_images=True).limit(50)
    m = json.loads(encode_canal_json_typed(ch).select("message")
                   .first()["message"])
    # tiflow GetMySQLType(col, false): short names via types.TypeToStr
    assert m["mysqlType"] == {"pk": "bigint", "event_type": "varchar",
                              "value_cents": "bigint"}


def test_uri_threads_flag_and_forces_only_updated(spark):
    from tigate_spark.config import ChangefeedConfig
    from tigate_spark.streaming.changefeed import _apply_sink_uri_options

    cfg = ChangefeedConfig(
        changefeed_id="cc",
        sink_uri="changelog:///tmp/x?protocol=canal-json"
                 "&content-compatible=true")
    _apply_sink_uri_options(cfg)
    assert cfg.sink.content_compatible is True
    assert cfg.sink.only_output_updated_columns is True  # config.go:264

    # other protocols ignore the flag (config.go:262 gates on canal-json)
    cfg2 = ChangefeedConfig(
        changefeed_id="cc2",
        sink_uri="changelog:///tmp/x?protocol=open-protocol"
                 "&content-compatible=true")
    _apply_sink_uri_options(cfg2)
    assert cfg2.sink.content_compatible is False
    assert cfg2.sink.only_output_updated_columns is False


def test_changefeed_emits_content_compatible_wire(spark, sf_dir, tmp_path):
    """e2e through the changelog sink: the URI flag changes the stored
    message bytes (full mysqlType map present)."""
    import os

    from tigate_spark.config import ChangefeedConfig
    from tigate_spark.streaming.changefeed import Changefeed

    src = str(tmp_path / "events_src")
    spark.read.parquet(
        os.path.join(sf_dir, "events.parquet")
    ).limit(500).coalesce(1).write.parquet(src)
    cfg = ChangefeedConfig(
        changefeed_id="cc-e2e",
        sink_uri="changelog:///tmp/unused?protocol=canal-json"
                 "&content-compatible=true")
    feed = Changefeed(spark, cfg, src, str(tmp_path / "work"))
    feed.run_to_completion()
    log = spark.read.parquet(feed.sink.out_dir)
    msg = log.filter(F.col("message").contains('"type":"UPDATE"')) \
        .select("message").first()["message"]
    m = json.loads(msg)
    assert m["mysqlType"]["pk"] == "bigint(20)"
    assert list(m["old"][0]) == ["value_cents"]


# -- standalone only-output-updated-columns (sink.go:160) --------------------

def test_only_updated_old_image_general_diff(spark):
    """The image diff is general: multi-field changes keep every changed
    fragment (original quoting preserved), no-change updates render an
    empty object, and string-typed changes survive verbatim."""
    from tigate_spark.operators.projections import only_updated_old_image

    rows = [
        ('{"pk":1,"event_type":"click","value_cents":100,"user_id":5}',
         '{"pk":1,"event_type":"view","value_cents":200,"user_id":5}'),
        ('{"pk":2,"event_type":"buy","value_cents":7,"user_id":9}',
         '{"pk":2,"event_type":"buy","value_cents":7,"user_id":9}'),
        ('{"pk":3,"event_type":"a,b","value_cents":1,"user_id":2}',
         '{"pk":3,"event_type":"a,b","value_cents":9,"user_id":2}'),
    ]
    df = spark.createDataFrame(rows, "before string, after string")
    out = [r["old"] for r in df.select(
        only_updated_old_image(df.before, df.after).alias("old")).collect()]
    assert out[0] == '{"event_type":"click","value_cents":100}'
    assert out[1] == "{}"
    # a comma INSIDE a quoted value does not split the fragment (the
    # ',"' boundary requires the quote)
    assert out[2] == '{"value_cents":1}'


def test_only_updated_uri_param_threads_to_wire(spark, sf_dir, tmp_path):
    import os

    from tigate_spark.config import ChangefeedConfig
    from tigate_spark.streaming.changefeed import Changefeed

    src = str(tmp_path / "events_src")
    spark.read.parquet(
        os.path.join(sf_dir, "events.parquet")
    ).limit(500).coalesce(1).write.parquet(src)
    cfg = ChangefeedConfig(
        changefeed_id="oouc-e2e",
        sink_uri="changelog:///tmp/unused?protocol=canal-json"
                 "&only-output-updated-columns=true")
    feed = Changefeed(spark, cfg, src, str(tmp_path / "work"))
    assert cfg.sink.only_output_updated_columns is True
    feed.run_to_completion()
    log = spark.read.parquet(feed.sink.out_dir)
    msg = log.filter(F.col("message").contains('"type":"UPDATE"')) \
        .select("message").first()["message"]
    m = json.loads(msg)
    assert list(m["old"][0]) == ["value_cents"]  # only the changed column
    assert "mysqlType" not in m  # plain canal wire, not content-compatible


def test_storage_sink_honors_canal_flags(spark, sf_dir, tmp_path):
    """canal_json_storage_* composition: the dated-tree storage sink
    renders the same content-compatible wire as the MQ path."""
    import glob
    import os

    from tigate_spark.config import ChangefeedConfig
    from tigate_spark.streaming.changefeed import Changefeed

    src = str(tmp_path / "events_src")
    spark.read.parquet(
        os.path.join(sf_dir, "events.parquet")
    ).limit(400).coalesce(1).write.parquet(src)
    cfg = ChangefeedConfig(
        changefeed_id="cc-storage",
        sink_uri="file:///unused?protocol=canal-json"
                 "&content-compatible=true&date-separator=day")
    feed = Changefeed(spark, cfg, src, str(tmp_path / "work"))
    feed.run_to_completion()
    leaf = [p for p in glob.glob(str(tmp_path / "work") + "/storage/**/*",
                                 recursive=True)
            if os.path.isfile(p) and "part-" in p and "metadata" not in p]
    assert leaf
    lines = []
    for p in leaf:
        lines += [ln for ln in open(p).read().splitlines() if ln]
    upd = [ln for ln in lines if '"type":"UPDATE"' in ln]
    assert upd
    m = json.loads(upd[0])
    assert m["mysqlType"]["pk"] == "bigint(20)"
    assert list(m["old"][0]) == ["value_cents"]
