"""CSVConfig (pkg/config/sink.go:250-325) — validation matrix mirror of
validateAndAdjust, plus the feed-level wiring: a storage changefeed with
[sink.csv] set writes lines in the configured dialect and the configured
decoder round-trips them."""

from __future__ import annotations

import os

import pytest

from tigate_spark.config import ChangefeedConfig, CSVConfig, SinkConfig


@pytest.mark.parametrize("kw,msg", [
    ({"quote": '""'}, "more than one character"),
    ({"quote": "\n"}, "line break"),
    ({"delimiter": ""}, "cannot be empty"),
    ({"delimiter": "abcd"}, "more than three"),
    ({"delimiter": "a\nb"}, "line break"),
    ({"delimiter": '|"'}, "common characters"),
    ({"binary_encoding_method": "utf8"}, "hex or base64"),
])
def test_csv_config_rejects(kw, msg):
    with pytest.raises(ValueError, match=msg):
        CSVConfig(**kw).validate()


@pytest.mark.parametrize("kw", [
    {},                                     # defaults
    {"delimiter": "|||"},                   # up to 3 chars
    {"quote": "'", "delimiter": ","},
    {"quote": ""},                          # quoting disabled
    {"binary_encoding_method": "base64"},
    {"include_commit_ts": False},
])
def test_csv_config_accepts(kw):
    CSVConfig(**kw).validate()


def test_csv_config_requires_csv_protocol(spark, sf_dir, tmp_path):
    from tigate_spark.streaming.changefeed import Changefeed

    cfg = ChangefeedConfig(
        changefeed_id="cf-csvcfg-bad", sink_uri="file://",
        sink=SinkConfig(protocol="canal-json", csv=CSVConfig()))
    with pytest.raises(ValueError, match="requires protocol=csv"):
        Changefeed(spark, cfg, os.path.join(sf_dir, "events.parquet"),
                   str(tmp_path))


def test_storage_feed_honors_csv_config(spark, sf_dir, tmp_path):
    """End to end through the changefeed: [sink.csv] delimiter='|' with
    include-commit-ts=false lands in the dated tree; the configured
    decoder parses every line back with the quoted props intact."""
    from pyspark.sql import functions as F

    from tigate_spark.functions.encoders import decode_csv_configured
    from tigate_spark.sources.changes import changes_stream
    from tigate_spark.streaming.changefeed import Changefeed

    csv = CSVConfig(delimiter="|", include_commit_ts=False)
    cfg = ChangefeedConfig(
        changefeed_id="cf-csvcfg", sink_uri="file://",
        sink=SinkConfig(protocol="csv", csv=csv))
    cf = Changefeed(spark, cfg, os.path.join(sf_dir, "events.parquet"),
                    str(tmp_path))
    cf.run_to_completion()
    lines = (
        spark.read.option("recursiveFileLookup", "true")
        .option("pathGlobFilter", "part-*")
        .text(cf.sink.out_dir)
        .withColumnRenamed("value", "line")
    )
    n_src = changes_stream(spark, sf_dir).count()
    assert lines.count() == n_src
    # the configured dialect round-trips: every line parses, ops valid
    dec = decode_csv_configured(lines, csv)
    assert dec.filter(F.col("op").isin("I", "U", "D")).count() == n_src
    assert "commit_ts" not in dec.columns  # include-commit-ts=false
    assert dec.filter(F.col("pk").isNull()).count() == 0


def test_config_round_trip_with_csv():
    from tigate_spark.config import (
        changefeed_config_from_dict,
        changefeed_config_to_dict,
    )

    cfg = ChangefeedConfig(
        changefeed_id="cf-rt", sink_uri="file://",
        sink=SinkConfig(protocol="csv", txn_atomicity="table",
                        csv=CSVConfig(delimiter="|")))
    d = changefeed_config_to_dict(cfg)
    back = changefeed_config_from_dict(d)
    assert back.sink.csv == CSVConfig(delimiter="|")
    assert back.sink.txn_atomicity == "table"


def test_quote_disabled_dialect_is_truly_unquoted(spark):
    """CSVConfig(quote='') must put NO quote character on the wire —
    not Spark's NUL-quote fallback — and the split-based decode must
    invert it (the quote-less reference dialect)."""
    from pyspark.sql import functions as F

    from tigate_spark.functions.encoders import (
        decode_csv_configured,
        encode_csv_configured,
    )

    cfg = CSVConfig(delimiter="|", quote="", null_string="\\N")
    df = spark.createDataFrame(
        [("I", "app", "t1", 10, 1, 'has"quote', 5),
         ("U", "app", "t2", 20, 2, None, None)],
        "op string, schema_name string, table_name string, "
        "commit_ts bigint, pk bigint, event_type string, "
        "value_cents bigint")
    enc = encode_csv_configured(df, cfg)
    lines = {r["pk"]: r["line"] for r in enc.collect()}
    assert lines[1] == 'I|app|t1|10|1|has"quote|5'  # raw quote, no wrap
    assert lines[2] == "U|app|t2|20|2|\\N|\\N"
    assert "\x00" not in lines[1]  # NOT the NUL-quote fallback
    dec = decode_csv_configured(
        enc.select(F.col("pk").alias("pk_in"), "line"), cfg)
    back = {r["pk_in"]: r for r in dec.collect()}
    assert back[1]["event_type"] == 'has"quote'
    assert back[2]["event_type"] is None and back[2]["value_cents"] is None


def test_mark_applied_clamped_to_resolved(spark, tmp_path):
    """An out-of-order batch whose resolved advance was withheld must
    not let the sink's checkpoint overtake the WAL's resolved frontier
    (the checkpoint<=resolved invariant recovery rests on)."""
    from tigate_spark.streaming.redo import RedoLog

    log = RedoLog(str(tmp_path / "redo"))
    df = spark.createDataFrame([(10, 0), (20, 1)], "commit_ts bigint, pk bigint")
    log.log_batch(df, 0)
    assert log.meta()["resolved_ts"] == 20
    ooo = spark.createDataFrame([(5, 2), (25, 3)], "commit_ts bigint, pk bigint")
    log.log_batch(ooo, 1)  # guard freezes resolved at 20
    log.mark_applied(1, 25)  # sink applied through 25 anyway
    m = log.meta()
    assert m["resolved_ts"] == 20
    assert m["checkpoint_ts"] == 20  # clamped, invariant holds
    assert m["checkpoint_ts"] <= m["resolved_ts"]
