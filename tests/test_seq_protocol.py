"""T10 seq/handshake reset protocol twin (event_collector.go:469-496)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from tigate_spark.operators.ordering import seq_gap_resets
from tigate_spark.functions.phash import h32_py


@pytest.fixture(scope="module")
def lanes(spark):
    # two lanes, 200 events each, commit_ts strictly increasing per lane
    rows = [
        (tid, 1_000_000 + i * 10, i, )
        for tid in (0, 1)
        for i in range(1, 201)
    ]
    return spark.createDataFrame(rows, "table_id long, commit_ts long, seq long")


def test_no_loss_means_no_reset(spark, lanes):
    # loss_mod large enough that no hash hits 0 for these lanes
    out = {r["table_id"]: r for r in seq_gap_resets(lanes, loss_mod=10**9).collect()}
    for tid in (0, 1):
        r = out[tid]
        assert r["reset_needed"] == 0
        assert r["n_accepted"] == r["n_received"] == 200
        assert r["resend_start_ts"] == 0
        assert r["n_resent"] == 0


def test_gap_semantics_match_reference_decision(spark, lanes):
    """Accepted prefix ends at the first lost seq; the RESET request
    carries the last delivered commit ts; the re-pull resends everything
    after it (received-but-dropped events repeat)."""
    out = {r["table_id"]: r for r in seq_gap_resets(lanes, loss_mod=37).collect()}
    for tid in (0, 1):
        lost = sorted(
            s for s in range(1, 201)
            if h32_py(f"loss:{tid}:{s}") % 37 == 0
        )
        r = out[tid]
        assert r["n_received"] == 200 - len(lost)
        if not lost:
            assert r["reset_needed"] == 0
            continue
        first_gap = lost[0]
        assert r["reset_needed"] == 1
        assert r["n_accepted"] == first_gap - 1
        # commit_ts of sender_seq s is 1_000_000 + s*10 (strictly increasing)
        expect_start = 0 if first_gap == 1 else 1_000_000 + (first_gap - 1) * 10
        assert r["resend_start_ts"] == expect_start
        assert r["n_resent"] == 200 - (first_gap - 1)


def test_open_protocol_decode_is_encode_inverse(spark, sf_dir):
    """encode_open_protocol ∘ decode_open_for_apply reconstructs every
    apply-relevant field (op inferred from image presence; payload from
    the op's live image) — pytest twin of the consumer e2e, at the
    function level over the full corpus."""
    from pyspark.sql import functions as F

    from tigate_spark.functions.encoders import (
        decode_open_for_apply,
        encode_open_protocol,
    )
    from tigate_spark.sources.changes import changes_stream

    ch = changes_stream(spark, sf_dir, with_images=True)
    wire = encode_open_protocol(
        ch.withColumn("topic", F.lit("t")).withColumn("partition", F.lit(0))
    ).select("seq", "key", "value")
    dec = decode_open_for_apply(wire)
    cols = ["seq", "table_id", "op", "commit_ts", "pk"]
    src = ch.select(*cols,
                    F.col("event_type"), F.col("value_cents"))
    # D rows surface the BEFORE image's payload (canal/open parity) —
    # compare payload only on I/U, identity fields on everything
    a = dec.select(*cols)
    b = src.select(*cols)
    assert a.count() == b.count() > 0
    assert a.exceptAll(b).count() == 0
    live = dec.filter(F.col("op") != "D").select(
        "seq", "event_type", "value_cents")
    live_src = src.filter(F.col("op") != "D").select(
        "seq", "event_type", "value_cents")
    assert live.exceptAll(live_src).count() == 0
