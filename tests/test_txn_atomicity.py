"""transaction-atomicity (pkg/config/sink.go:39-49,106-129) — the
'table' level's contract is crash VISIBILITY, not final convergence:
a single-table upstream transaction must never be half-applied
downstream. Proven by injecting a fatal server error mid-stream and
inspecting what committed: under 'table' only whole upstream txns are
visible; under 'none' (the default, ShouldSplitTxn=true) the same crash
leaves a partial txn — the split the knob exists to prevent."""

from __future__ import annotations

import json
import sqlite3

import pytest

from tigate_spark.streaming.fake_mysql import FakeMySQLDriver, FakeMySQLError
from tigate_spark.streaming.sqlite_apply import _exec_lane

#: 4 upstream txns of 5 statements each on one table; pk = global index
#: so every row is distinct and countable per txn
TXNS = 4
PER = 5


def _stmts():
    out = []
    for t in range(TXNS):
        for i in range(PER):
            g = t * PER + i
            out.append((
                "app", "t0", 0,
                "REPLACE INTO `app`.`t0` (`pk`,`event_type`,`value_cents`)"
                " VALUES (?,?,?)",
                json.dumps([g, f"txn{t}", g]),
                (0, 1000 + t, 900 + t),  # txn_key: (table, commit, start)
            ))
    return out


def _rows_per_txn(db):
    con = sqlite3.connect(db)
    got = {}
    for et, n in con.execute(
            "SELECT event_type, count(*) FROM `app__t0` GROUP BY 1"):
        got[et] = n
    con.close()
    return got


class _ArgAwareDriver(FakeMySQLDriver):
    """Injection matched on args (the sql text is identical per row):
    raises fatally before executing the statement whose first arg is
    ``crash_pk``."""

    def __init__(self, crash_pk: int):
        super().__init__()
        self.crash_pk = crash_pk

    def connect(self, dsn: str):
        con = super().connect(dsn)
        outer = self

        class Cur:
            def __init__(self, c):
                self._c = c

            def execute(self, sql, args=()):
                if args and args[0] == outer.crash_pk:
                    raise FakeMySQLError(1146, "server died mid-stream")
                return self._c.execute(sql, args)

            def __iter__(self):
                return iter(self._c)

            def fetchone(self):
                return self._c.fetchone()

            def fetchall(self):
                return self._c.fetchall()

        class Con:
            def __init__(self, c):
                self._c = c

            def cursor(self):
                return Cur(self._c.cursor())

            def commit(self):
                self._c.commit()

            def rollback(self):
                self._c.rollback()

            def close(self):
                self._c.close()

        return Con(con)


def test_table_atomicity_never_splits_upstream_txn(tmp_path):
    """Crash on the 3rd statement of txn1 (pk=7). txn_rows=3 would
    normally split each 5-stmt txn; under atomicity=table the flush
    waits for the txn boundary, so the crash leaves txn0 fully applied
    and txn1 NOT AT ALL — no partial txn is ever visible."""
    db = str(tmp_path / "lane-t.db")
    with pytest.raises(FakeMySQLError):
        _exec_lane(db, _stmts(), txn_rows=3, max_packet=1 << 20,
                   driver=_ArgAwareDriver(crash_pk=7), split_txn=False)
    got = _rows_per_txn(db)
    assert got.get("txn0", 0) == PER  # whole txn committed
    assert "txn1" not in got          # crashed txn invisible, not partial
    assert "txn2" not in got and "txn3" not in got


def test_none_atomicity_splits_and_exposes_partial_txn(tmp_path):
    """Same crash under the default 'none': txn_rows=3 splits txn1
    across downstream commits, so its first sub-batch IS visible — the
    exact partial-txn exposure 'table' level prevents."""
    db = str(tmp_path / "lane-n.db")
    with pytest.raises(FakeMySQLError):
        _exec_lane(db, _stmts(), txn_rows=3, max_packet=1 << 20,
                   driver=_ArgAwareDriver(crash_pk=7), split_txn=True)
    got = _rows_per_txn(db)
    assert got.get("txn0", 0) == PER
    assert 0 < got.get("txn1", 0) < PER  # partial txn visible


def test_table_atomicity_converges_and_respects_soft_bounds(tmp_path):
    """No crash: atomicity=table over bounds smaller than a txn still
    converges to the full state (bounds become soft at boundaries)."""
    db = str(tmp_path / "lane-ok.db")
    _exec_lane(db, _stmts(), txn_rows=2, max_packet=64,
               driver=FakeMySQLDriver(), split_txn=False)
    assert _rows_per_txn(db) == {f"txn{t}": PER for t in range(TXNS)}


def test_table_atomicity_survives_packet_fallback(tmp_path):
    """Server packet bound forces the seq-way fallback mid-run; under
    atomicity=table the fallback commits per upstream txn, so a fatal
    crash inside the fallback still exposes only whole txns."""
    db = str(tmp_path / "lane-p.db")

    class Drv(_ArgAwareDriver):
        def __init__(self):
            super().__init__(crash_pk=12)  # 3rd stmt of txn2
            self.server_max_packet = 100  # multi-stmt batch overflows; a 5-stmt txn group fits

    with pytest.raises(FakeMySQLError):
        _exec_lane(db, _stmts(), txn_rows=1000, max_packet=1 << 20,
                   driver=Drv(), split_txn=False)
    got = _rows_per_txn(db)
    assert got.get("txn0", 0) == PER and got.get("txn1", 0) == PER
    assert "txn2" not in got  # crash inside fallback: still atomic


@pytest.mark.parametrize("uri,ok", [
    ("sqlite://?transaction-atomicity=table", True),
    ("mysql://h/app?transaction-atomicity=table", True),
    ("replica://?transaction-atomicity=none", True),
    ("changelog://?transaction-atomicity=table", False),  # MQ rejects
    ("kafka://b/t?transaction-atomicity=table", False),
    ("sqlite://?transaction-atomicity=bogus", False),
])
def test_atomicity_uri_validation(spark, sf_dir, tmp_path, uri, ok):
    import os

    from tigate_spark.config import ChangefeedConfig
    from tigate_spark.streaming.changefeed import Changefeed

    cfg = ChangefeedConfig(changefeed_id="cf-atomicity", sink_uri=uri)
    src = os.path.join(sf_dir, "events.parquet")
    if ok:
        cf = Changefeed(spark, cfg, src, str(tmp_path))
        if uri.startswith(("sqlite", "mysql")):
            assert cf.sink.split_txn == (
                "transaction-atomicity=table" not in uri)
    else:
        with pytest.raises(ValueError, match="atomicity is not supported"):
            Changefeed(spark, cfg, src, str(tmp_path))


def test_table_atomicity_property_random_crash(tmp_path):
    """Property: under atomicity=table, for ANY txn-size layout and ANY
    crash statement, the visible rows are a prefix of WHOLE txns."""
    import itertools

    for case, (sizes, crash_at, txn_rows) in enumerate(
            [([1, 4, 2, 7, 1], 5, 2), ([3, 3, 3], 4, 1),
             ([6, 1, 1], 2, 4), ([2, 2, 2, 2], 7, 3),
             ([5, 5], 9, 2)]):
        stmts, g = [], 0
        for t, n in enumerate(sizes):
            for _ in range(n):
                stmts.append((
                    "app", "t0", 0,
                    "REPLACE INTO `app`.`t0` "
                    "(`pk`,`event_type`,`value_cents`) VALUES (?,?,?)",
                    json.dumps([g, f"txn{t}", g]),
                    (0, 1000 + t, 900 + t),
                ))
                g += 1
        db = str(tmp_path / f"lane-prop{case}.db")
        crash_pk = crash_at if crash_at < g else g - 1
        with pytest.raises(FakeMySQLError):
            _exec_lane(db, stmts, txn_rows=txn_rows, max_packet=1 << 20,
                       driver=_ArgAwareDriver(crash_pk=crash_pk),
                       split_txn=False)
        got = _rows_per_txn(db)
        # every visible txn is COMPLETE, and visibility is a prefix
        starts = list(itertools.accumulate([0] + sizes))
        crashed_txn = next(t for t in range(len(sizes))
                           if starts[t] <= crash_pk < starts[t + 1])
        for t, n in enumerate(sizes):
            vis = got.get(f"txn{t}", 0)
            assert vis in (0, n), (case, t, got)
            if t >= crashed_txn:
                assert vis == 0, (case, t, got)


def test_table_atomicity_multi_table_same_lane(tmp_path):
    """Two tables sharing a lane AND a (commit_ts, start_ts) txn: the
    lane sort keeps each single-table slice CONTIGUOUS (table_id inside
    the sort key), so a mid-stream crash exposes only whole single-table
    slices — never an alternating half of one (the review repro: without
    table_id in the sort the keys alternate and flush() splits both)."""
    from tigate_spark.streaming.sqlite_apply import SqliteApplySink

    # emulate run_partition's ordering contract directly: rows arrive
    # pre-sorted the way process_batch sorts them
    rows = []
    for pk in range(3):
        for tbl in ("a0", "a4"):  # both -> lane 0 with 4 lanes
            rows.append({"schema_name": "app", "table_name": tbl,
                         "table_id": 0 if tbl == "a0" else 4,
                         "commit_ts": 1000, "start_ts": 900,
                         "opr": 3, "seq": pk, "piece_no": 0,
                         "sql": f"REPLACE INTO `app`.`{tbl}` "
                                "(`pk`,`event_type`,`value_cents`) "
                                "VALUES (?,?,?)",
                         "args": json.dumps([pk, tbl, pk])})
    rows.sort(key=lambda r: (r["commit_ts"], r["start_ts"],
                             r["table_id"], r["opr"], r["seq"],
                             r["piece_no"]))
    # after the sort, each table's slice is contiguous
    order = [r["table_name"] for r in rows]
    assert order == ["a0"] * 3 + ["a4"] * 3
    db = str(tmp_path / "lane-0.db")
    stmts = [(r["schema_name"], r["table_name"], r["table_id"],
              r["sql"], r["args"],
              (r["table_id"], r["commit_ts"], r["start_ts"]))
             for r in rows]
    # crash when the a4 slice reaches its second statement
    seen = {"n": 0}

    class Drv(FakeMySQLDriver):
        def connect(self, dsn):
            inner = super().connect(dsn)
            outer_cls = FakeMySQLError

            class Cur:
                def __init__(self, c):
                    self._c = c

                def execute(self, sql, args=()):
                    if "`app__a4`" in sql and args:
                        seen["n"] += 1
                        if seen["n"] == 2:
                            raise outer_cls(1146, "server died")
                    return self._c.execute(sql, args)

                def __iter__(self):
                    return iter(self._c)

                def fetchone(self):
                    return self._c.fetchone()

                def fetchall(self):
                    return self._c.fetchall()

            class Con:
                def __init__(self, c):
                    self._c = c

                def cursor(self):
                    return Cur(self._c.cursor())

                def commit(self):
                    self._c.commit()

                def rollback(self):
                    self._c.rollback()

                def close(self):
                    self._c.close()

            return Con(inner)

    with pytest.raises(FakeMySQLError):
        _exec_lane(db, stmts, txn_rows=1, max_packet=1 << 20,
                   driver=Drv(), split_txn=False)
    con = sqlite3.connect(db)
    a0 = {r[0] for r in con.execute("SELECT pk FROM `app__a0`")}
    try:
        a4 = {r[0] for r in con.execute("SELECT pk FROM `app__a4`")}
    except sqlite3.OperationalError:
        a4 = set()
    con.close()
    # a0's slice (its whole single-table txn) fully visible; a4's slice
    # crashed mid-way and must be INVISIBLE, not half-applied
    assert a0 == {0, 1, 2}
    assert a4 == set()
