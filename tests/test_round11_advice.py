"""Round-11 regression tests for the advisor's findings: the
default large-message threshold matching the reference's
DefaultMaxMessageBytes (pkg/config/sink.go:35), bare-header
unretryable classification, and the fake-MySQL packet counter only
accruing inside an open transaction."""

from __future__ import annotations

import pytest

from tigate_spark.config import SinkConfig
from tigate_spark.engine import _is_unretryable
from tigate_spark.streaming.fake_mysql import FakeMySQLDriver, FakeMySQLError


# -- default max-message-bytes = 10 MiB -------------------------------------

def test_default_large_message_threshold_is_10mib():
    """A default-config feed must deliver the 1-10 MiB messages the
    reference's DefaultMaxMessageBytes=10MiB would, instead of failing
    the ErrMessageTooLarge guard at 1 MiB."""
    assert SinkConfig().large_message_threshold == 10 * 1024 * 1024


# -- bare first-line headers classify ---------------------------------------

def test_unretryable_matches_bare_first_line():
    """Spark STREAM_FAILED headers carry no `ClassName:` prefix; the
    first line must still be scanned even when a deeper `Caused by:`
    line matches the header regex (and does NOT carry a pattern)."""
    exc = RuntimeError(
        "[STREAM_FAILED] Query xyz terminated: invalid partition-num\n"
        "Caused by: java.io.IOException: connection reset by peer\n")
    assert _is_unretryable(exc)


def test_transient_bare_first_line_stays_retryable():
    exc = RuntimeError(
        "[STREAM_FAILED] Query xyz terminated: executor lost\n"
        "Caused by: java.io.IOException: connection reset by peer\n")
    assert not _is_unretryable(exc)


# -- packet counter only accrues inside a txn --------------------------------

def test_fake_mysql_packet_counts_only_in_txn(tmp_path):
    drv = FakeMySQLDriver(server_max_packet=64)
    con = drv.connect(str(tmp_path / "lane.db"))
    cur = con.cursor()
    cur.execute("CREATE TABLE t (pk INTEGER PRIMARY KEY, v TEXT)")
    con.commit()
    # autocommit setup statements: big args, but NO open txn -> no 1153
    for i in range(10):
        cur.execute("INSERT INTO t VALUES (?, ?)", (i, "x" * 40))
    con.commit()
    # a real txn under the same budget DOES hit the server packet cap
    cur.execute("BEGIN")
    with pytest.raises(FakeMySQLError) as ei:
        for i in range(10, 20):
            cur.execute("INSERT INTO t VALUES (?, ?)", (i, "y" * 40))
    assert ei.value.errno == 1153
    con.rollback()
    # commit/rollback reset: the next txn starts from a zero packet
    cur2 = con.cursor()
    cur2.execute("BEGIN")
    cur2.execute("INSERT INTO t VALUES (?, ?)", (99, "z"))
    con.commit()
