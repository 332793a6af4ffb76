"""Round-8: the CSV source contract is SPLITTABLE and null/empty-exact.

r7 shipped the CSV connector with ``multiLine=true`` (correct, but each
file becomes one scan task — the 100 TB failure mode) and default
null/empty handling (a data ``''`` came back null). Round 8 replaces
that with a newline-free export contract (``csv_escape_text``) read at
``multiLine=false`` plus pinned ``nullValue``/``emptyValue``; these
tests pin (a) exact inverse of the escape pair including hostile
payloads, (b) byte-identical parquet-vs-CSV round trips for null AND
empty string, (c) the scan genuinely splitting one physical file into
many partitions, and (d) the streaming changefeed CSV branch carrying a
props value with embedded newlines end-to-end.
"""

from __future__ import annotations

import glob
import os

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
import pytest

HOSTILE_PROPS = [
    "plain",
    "with,comma",
    'with "quote"',
    "back\\slash",
    "new\nline",
    "cr\rhere and\r\nboth",
    "tab\there",
    "",            # empty string — must NOT come back null
    None,          # null — must NOT come back ''
    'mix "q,\\n" \\\n\r end\\',
    "\\N",         # literal backslash-N data vs the null sentinel
    "trail\\",
    "\\\nx",
]


def _hostile_sf_dir(spark, tmp_path):
    rows = [
        (i, 1_700_000_000_000_000 + i * 1_000_000, i % 7,
         "click" if i != 3 else 'ty"pe\nln', float(i), p)
        for i, p in enumerate(HOSTILE_PROPS)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts_us long, user_id long, event_type string, "
        "value double, props string",
    ).select(
        "event_id", F.timestamp_micros("ts_us").alias("ts"), "user_id",
        "event_type", "value", "props",
    )
    d = str(tmp_path / "sf-hostile")
    df.write.parquet(os.path.join(d, "events.parquet"))
    return d


def test_csv_round_trip_hostile_props(spark, tmp_path):
    from tigate_spark.sources.batch import load_table
    from tigate_spark.sources.formats import export_events, read_events

    d = _hostile_sf_dir(spark, tmp_path)
    out = export_events(spark, d, "csv")
    # the contract itself: no record spans a physical line — total line
    # count == rows + one header per part file
    files = glob.glob(os.path.join(out, "*.csv"))
    n_lines = sum(open(f).read().count("\n") for f in files)
    assert n_lines == len(HOSTILE_PROPS) + len(files)

    back = read_events(spark, out, "csv")
    want = {r["event_id"]: (r["event_type"], r["props"])
            for r in load_table(spark, d, "events").collect()}
    got = {r["event_id"]: (r["event_type"], r["props"])
           for r in back.collect()}
    assert got == want  # null stays null, '' stays '', newlines intact


def test_csv_scan_splits_one_file(spark, sf_dir):
    """One physical CSV file must fan out to many scan partitions under a
    small maxPartitionBytes — the property multiLine=true destroys."""
    from tigate_spark.sources.formats import export_events, read_events

    out = export_events(spark, sf_dir, "csv")
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try:
        spark.conf.set("spark.sql.files.maxPartitionBytes", str(8 * 1024))
        back = read_events(spark, out, "csv")
        biggest = max(os.path.getsize(f)
                      for f in glob.glob(os.path.join(out, "*.csv")))
        assert biggest > 32 * 1024, "sf0.001 export unexpectedly tiny"
        parts = back.rdd.getNumPartitions()
        assert parts > len(glob.glob(os.path.join(out, "*.csv"))), \
            f"scan did not split files: {parts} partitions"
        # and the split scan still reads every row exactly once
        assert back.count() == spark.read.parquet(
            os.path.join(sf_dir, "events.parquet")).count()
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)


chars = st.sampled_from(list('ab\\\n\r",\tN'))
payload = st.text(alphabet=chars, max_size=24)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@pytest.mark.slow
@given(st.lists(payload, min_size=1, max_size=16))
def test_escape_pair_is_exact_inverse(spark_prop, texts):
    from tigate_spark.sources.formats import csv_escape_text, csv_unescape_text

    df = spark_prop.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i long, t string")
    esc = df.select("i", csv_escape_text(F.col("t")).alias("e"))
    # escaped form is newline-free (the splittability invariant)
    assert esc.filter(F.col("e").contains("\n")
                      | F.col("e").contains("\r")).count() == 0
    got = {r["i"]: r["u"] for r in
           esc.select("i", csv_unescape_text(F.col("e")).alias("u"))
           .collect()}
    assert got == {i: t for i, t in enumerate(texts)}


@pytest.mark.slow
def test_streaming_csv_changefeed_hostile_newlines(spark, tmp_path):
    """The changefeed CSV branch (config.source_format='csv') ingests the
    newline-free export and the replica's payload columns match the
    parquet-path materialization — including an event_type carrying a
    quote + newline."""
    from tigate_spark.config import ChangefeedConfig
    from tigate_spark.operators.apply import materialize
    from tigate_spark.sources.changes import changes_stream
    from tigate_spark.sources.formats import export_events
    from tigate_spark.streaming.changefeed import Changefeed
    from tigate_spark.streaming.sinks import read_replica

    d = _hostile_sf_dir(spark, tmp_path)
    src = export_events(spark, d, "csv")
    cfg = ChangefeedConfig(changefeed_id="csv-hostile", sink_uri="replica://",
                           source_format="csv")
    cf = Changefeed(spark, cfg, src, str(tmp_path / "work"))
    cf.run_to_completion()
    got = {
        (r["table_id"], r["pk"]): (r["event_type"], r["value_cents"])
        for r in read_replica(spark, cf.sink.state_dir).collect()
    }
    want = {
        (r["table_id"], r["pk"]): (r["event_type"], r["value_cents"])
        for r in materialize(
            changes_stream(spark, d),
            ["event_type", "value_cents", "user_id"]).collect()
    }
    assert got == want and any("\n" in et for et, _ in got.values())
