"""Create-time + encode-time validations added in round 10:
target-ts-before-start-ts, start-ts-before-GC-safepoint, and the
ErrMessageTooLarge class on the MQ encode path."""

from __future__ import annotations

import os

import pytest

from tigate_spark.config import ChangefeedConfig
from tigate_spark.engine import Engine
from tigate_spark.streaming.changefeed import Changefeed


def test_target_ts_before_start_ts_rejected(spark, sf_dir, tmp_path):
    """ErrTargetTsBeforeStartTs (api/v2/changefeed.go:121-124)."""
    cfg = ChangefeedConfig(changefeed_id="cf-tts", sink_uri="noop://",
                           start_ts=100, target_ts=100)
    with pytest.raises(ValueError, match="target-ts must be after"):
        Changefeed(spark, cfg, os.path.join(sf_dir, "events.parquet"),
                   str(tmp_path))
    # target after start is fine; target with no start is fine
    Changefeed(spark, ChangefeedConfig(
        changefeed_id="cf-tts2", sink_uri="noop://",
        start_ts=100, target_ts=101),
        os.path.join(sf_dir, "events.parquet"), str(tmp_path))


def test_start_ts_before_gc_safepoint_rejected(spark, sf_dir, tmp_path):
    """ErrStartTsBeforeGC (api/v2/changefeed.go:106-118): events at or
    below the GC safepoint are vacuumed — nothing exists to replicate."""
    eng = Engine(spark, os.path.join(sf_dir, "events.parquet"),
                 str(tmp_path), gc_safepoint_ts=1_000)
    # the boundary is INCLUSIVE (gc manager: error iff startTs - 1 <
    # safepoint): events AT the safepoint are already vacuumed
    for bad in (999, 1_000):
        with pytest.raises(ValueError, match="GC safepoint"):
            eng.create(ChangefeedConfig(changefeed_id=f"cf-gc-{bad}",
                                        sink_uri="noop://", start_ts=bad))
    # strictly after the safepoint is fine; start_ts=0 (from-beginning
    # over a file source) bypasses the check like the reference's
    # current-tso default path
    eng.create(ChangefeedConfig(changefeed_id="cf-gc-ok",
                                sink_uri="noop://", start_ts=1_001))
    eng.create(ChangefeedConfig(changefeed_id="cf-gc-zero",
                                sink_uri="noop://"))


def test_message_too_large_fails_feed(spark, sf_dir, tmp_path):
    """ErrMessageTooLarge (open/encoder.go:43-52): a message over
    max-message-bytes with no large-message-handle fails the feed, and
    the engine's error-state machine classifies it unretryable
    (deterministic — retrying produces the same message)."""
    eng = Engine(spark, os.path.join(sf_dir, "events.parquet"),
                 str(tmp_path))
    cid = eng.create(ChangefeedConfig(
        changefeed_id="cf-toolarge",
        sink_uri="changelog://?max-message-bytes=32"))
    with pytest.raises(Exception, match="ErrMessageTooLarge"):
        eng.run_to_completion(cid)
    assert eng._feeds[cid].state == "failed"
    assert eng._feeds[cid].meta["error"]["retryable"] is False


def test_claim_check_offloads_oversize_instead_of_failing(spark, sf_dir,
                                                          tmp_path):
    """Same tiny bound WITH claim-check: oversize messages become
    object-store pointers and the feed completes."""
    from pyspark.sql import functions as F

    eng = Engine(spark, os.path.join(sf_dir, "events.parquet"),
                 str(tmp_path))
    cid = eng.create(ChangefeedConfig(
        changefeed_id="cf-claim",
        sink_uri="changelog://?max-message-bytes=64"
                 "&large-message-handle=claim-check"))
    eng.run_to_completion(cid)
    out = spark.read.parquet(eng._feeds[cid].changefeed.sink.out_dir)
    assert out.count() > 0
    # every landed message respects the bound or is a pointer
    assert out.filter(
        (F.octet_length("message") > 64)
        & ~F.col("message").contains("claimCheckLocation")).count() == 0


def test_message_too_large_guards_avro_hex_bytes(spark, sf_dir, tmp_path):
    """The avro lane's wire is hex strings (2 chars per byte): the
    guard must measure BYTES (len/2), and must fire for avro at all —
    the reference errors on every codec, and avro can't even use
    claim-check (this repo's own validation rejects the combination)."""
    eng = Engine(spark, os.path.join(sf_dir, "events.parquet"),
                 str(tmp_path))
    cid = eng.create(ChangefeedConfig(
        changefeed_id="cf-avro-toolarge",
        sink_uri="changelog://?protocol=avro&max-message-bytes=16"))
    with pytest.raises(Exception, match="ErrMessageTooLarge"):
        eng.run_to_completion(cid)
    assert eng._feeds[cid].state == "failed"


def test_unretryable_matches_any_exception_header_line():
    """Python chaining prints the ROOT first ('During handling...'), so
    classification must scan every exception-header line, not just the
    last one — a deterministic config root wrapped by an incidental
    cleanup error still fast-fails."""
    from tigate_spark.engine import _is_unretryable

    chained = RuntimeError(
        "ValueError: invalid partition-num='0' in sink-uri\n"
        "\n"
        "During handling of the above exception, another exception "
        "occurred:\n"
        "\n"
        "Traceback (most recent call last):\n"
        '  File "x.py", line 2, in cleanup\n'
        "OSError: failed to remove temp dir\n")
    assert _is_unretryable(chained)
    transient_chain = RuntimeError(
        "java.io.IOException: connection reset\n"
        "During handling of the above exception, another exception "
        "occurred:\n"
        "OSError: failed to remove temp dir\n")
    assert not _is_unretryable(transient_chain)


def test_update_rejected_config_leaves_feed_untouched(spark, sf_dir,
                                                      tmp_path):
    """PUT with an invalid config must be atomic: the feed keeps its
    previous cfg AND changefeed when Changefeed validation rejects the
    replacement."""
    eng = Engine(spark, os.path.join(sf_dir, "events.parquet"),
                 str(tmp_path))
    cid = eng.create(ChangefeedConfig(changefeed_id="cf-upd-atomic",
                                      sink_uri="replica://"))
    before_cf = eng.changefeed(cid)
    bad = ChangefeedConfig(
        changefeed_id="cf-upd-atomic",
        sink_uri="changelog://?transaction-atomicity=table")  # MQ rejects
    with pytest.raises(ValueError, match="atomicity is not supported"):
        eng.update(cid, bad)
    assert eng._feeds[cid].cfg.sink_uri == "replica://"
    assert eng.changefeed(cid) is before_cf
