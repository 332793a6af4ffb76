"""Property test: the configured CSV codec round-trips adversarial
payloads — quotes, delimiters, backslashes, newlines, JSON — through
F.to_csv → F.from_csv under the CSVConfig dialect.

Known (documented) univocity writer lossiness is excluded from the
domain rather than papered over: unquoted values are whitespace-TRIMMED
at the edges, and a value equal to the null token is indistinguishable
from NULL on the wire — both hold for the reference's csv storage
format too (its NullString has the same ambiguity)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tigate_spark.config import CSVConfig

#: printable-ish text including every character class the quoting rule
#: dispatches on
_payload = st.text(
    alphabet=st.sampled_from(
        list("abzAZ09 _-.,|\"'\\{}[]:\n\t") + ["é", "中"]),
    min_size=0, max_size=24,
).filter(
    # univocity trims unquoted edge whitespace and normalizes bare \r
    # inside quotes — both excluded from the domain (documented writer
    # lossiness), as is a value colliding with the null token
    lambda s: s == s.strip() and s != "\\N"
)


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(st.tuples(_payload, _payload,
                          st.integers(0, 2**40),
                          st.one_of(st.none(), st.integers(-100, 100))),
                min_size=1, max_size=15))
def test_csv_configured_round_trip(spark_prop, rows):
    from pyspark.sql import functions as F

    from tigate_spark.functions.encoders import (
        decode_csv_configured,
        encode_csv_configured,
    )

    spark = spark_prop
    cfg = CSVConfig(delimiter="|", quote='"', null_string="\\N",
                    include_commit_ts=True)
    df = spark.createDataFrame(
        [("I", "app", t or "t", ts, i, e or "e", vc)
         for i, (t, e, ts, vc) in enumerate(rows)],
        "op string, schema_name string, table_name string, "
        "commit_ts bigint, pk bigint, event_type string, "
        "value_cents bigint",
    )
    enc = encode_csv_configured(df, cfg)
    dec = decode_csv_configured(
        enc.select(F.col("pk").alias("pk_in"), "line"), cfg)
    back = {r["pk_in"]: r for r in dec.collect()}
    for r in df.collect():
        b = back[r["pk"]]
        assert b["event_type"] == r["event_type"], (
            r["event_type"], b["event_type"])
        assert b["table_name"] == r["table_name"]
        assert b["commit_ts"] == r["commit_ts"]
        assert b["value_cents"] == r["value_cents"]
        assert b["pk"] == r["pk"]
