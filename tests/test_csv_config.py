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
