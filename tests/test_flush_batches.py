"""flush_batches greedy semantics on VARIABLE txn sizes (the testdata's
txns are all single-row, so the catalog entry never exercises size
variance) — property-checked against a direct Python model of the
reference worker loop (mysql_worker.go:90-135), plus the oracle's
banded-boundary formulation on the same synthetic frame."""

from __future__ import annotations

import pytest
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


@pytest.mark.slow
def test_streaming_flush_matches_batch_on_variable_sizes(
        spark_prop, tmp_path_factory):
    """Cross-micro-batch state carry with VARIABLE txn sizes: a batch
    boundary landing mid-flush-batch must not split it — the streamed
    result equals the batch operator's on the same txns (the catalog
    corpus is all 1-row txns, so only this test exercises size variance
    through the stateful path)."""
    import glob
    import os
    import time

    from tigate_spark.catalog_streaming import split_df_in_order
    from tigate_spark.operators.txn import flush_batches
    from tigate_spark.streaming.stateful import flush_batch_accounting

    rows = [(i % 2, 10 + i, 100 + i, (i * 7) % 23 + 1) for i in range(40)]
    df = spark_prop.createDataFrame(
        rows, "table_id long, start_ts long, commit_ts long, n_rows long"
    )
    want = sorted(
        map(tuple, flush_batches(df, max_rows=25, n_lanes=2).collect())
    )

    work = tmp_path_factory.mktemp("flushstream")
    lanes = df.selectExpr("cast(table_id % 2 as long) lane", "table_id",
                          "start_ts", "commit_ts", "n_rows")
    flat, land = split_df_in_order(
        spark_prop, lanes, str(work), 3, "commit_ts, start_ts, table_id"
    )
    assert sum(land(k) for k in range(3)) == 40
    sent = lanes.select("lane").distinct().selectExpr(
        "lane", "cast(-1 as long) table_id", "cast(-1 as long) start_ts",
        "cast(1000 as long) commit_ts", "cast(0 as long) n_rows")
    sent_dir = os.path.join(str(work), "sent")
    sent.coalesce(1).write.parquet(sent_dir)
    now = time.time()
    for j, f in enumerate(sorted(glob.glob(os.path.join(sent_dir, "*.parquet")))):
        dst = os.path.join(flat, f"99-{j}.parquet")
        os.link(f, dst)
        os.utime(dst, (now + 9, now + 9))
    raw = (spark_prop.readStream.schema(sent.schema)
           .option("maxFilesPerTrigger", "1")
           .option("pathGlobFilter", "*.parquet").parquet(flat))
    out_dir = os.path.join(str(work), "out")
    ckpt = os.path.join(str(work), "ckpt")
    q = (flush_batch_accounting(raw, max_rows=25)
         .writeStream.format("parquet").option("path", out_dir)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    assert q.awaitTermination(120), "query still running at timeout"
    assert q.exception() is None, q.exception()
    got = sorted(map(tuple, spark_prop.read.parquet(out_dir).collect()))
    assert got == want
