"""flush_batches greedy semantics on VARIABLE txn sizes (the testdata's
txns are all single-row, so the catalog entry never exercises size
variance) — property-checked against a direct Python model of the
reference worker loop (mysql_worker.go:90-135), plus the oracle's
banded-boundary formulation on the same synthetic frame."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


def _model(rows, max_rows):
    """The reference loop: add txn, flush when cum > max_rows."""
    out, seq, cum, ntxn, first, last, sts = [], 1, 0, 0, 0, 0, set()
    for commit_ts, start_ts, nr in rows:
        if ntxn == 0:
            first = commit_ts
        cum += nr
        ntxn += 1
        last = commit_ts
        sts.add(start_ts)
        if cum > max_rows:
            out.append((seq, ntxn, cum, first, last, len(sts)))
            seq, cum, ntxn, sts = seq + 1, 0, 0, set()
    if ntxn:
        out.append((seq, ntxn, cum, first, last, len(sts)))
    return out


txn = st.tuples(
    st.integers(min_value=1, max_value=500),   # commit offset
    st.integers(min_value=1, max_value=200),   # n_rows (incl. > max_rows)
)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(txn, min_size=1, max_size=40, unique_by=lambda t: t[0]),
       st.sampled_from([5, 64]))
def test_flush_batches_matches_worker_model(spark_prop, txns, max_rows):
    from tigate_spark.operators.txn import flush_batches

    rows = [(i % 3, 1000 + c, 1000 + c + 1, nr)
            for i, (c, nr) in enumerate(txns)]
    df = spark_prop.createDataFrame(
        rows, "table_id long, start_ts long, commit_ts long, n_rows long"
    )
    got = {}
    for r in flush_batches(df, max_rows=max_rows, n_lanes=1).collect():
        assert r["lane"] == 0
        got[r["batch_seq"]] = (r["n_txns"], r["n_rows"], r["first_commit_ts"],
                               r["last_commit_ts"], r["n_start_ts"])
    ordered = sorted(((1000 + c + 1, 1000 + c, nr) for c, nr in txns))
    want = _model(ordered, max_rows)
    assert len(got) == len(want)
    for seq, ntxn, cum, first, last, nsts in want:
        assert got[seq] == (ntxn, cum, first, last, nsts), (seq, got[seq])


def test_oversized_txn_is_its_own_batch(spark_prop):
    from tigate_spark.operators.txn import flush_batches

    df = spark_prop.createDataFrame(
        [(0, 1, 2, 500), (0, 3, 4, 1), (0, 5, 6, 1)],
        "table_id long, start_ts long, commit_ts long, n_rows long",
    )
    rows = sorted(flush_batches(df, max_rows=64, n_lanes=1).collect(),
                  key=lambda r: r["batch_seq"])
    assert [(r["n_txns"], r["n_rows"]) for r in rows] == [(1, 500), (2, 2)]
