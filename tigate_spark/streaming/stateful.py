"""Custom stateful streaming operators — ``applyInPandasWithState`` +
watermark-windowed aggregation (T5/T9 streaming-native forms, SURVEY §7).

Reference parity: tigate keeps per-dispatcher cross-batch state (seen
resolved-ts, seq continuity) in its dynstream handlers; Spark's
equivalent primitive is ``applyInPandasWithState`` (per-key GroupState in
the state store, RocksDB-backed at scale). The flagship use here is
**streaming exact dedup** for LLM-pipeline ingestion: emit a document the
first micro-batch its content hash is seen, suppress every later
occurrence — state = one boolean per hash, storable at 100 TB scale
because the key space is the *distinct* hash set, partitioned by hash.

Spark 4's ``transformWithStateInPandas`` is the designed successor
(typed value/list/map state, timers, TTL); its driver worker needs the
``google.protobuf`` package, absent in this build environment, so every
stateful operator here sticks to ``applyInPandasWithState`` — the
migration is mechanical (GroupState → getValueState) when protobuf is
available.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

FIRST_SEEN_OUT = "group_key STRING, first_id BIGINT, first_seq BIGINT"
FIRST_SEEN_STATE = "seen BOOLEAN"


def first_seen(df: DataFrame, key_col: str, id_col: str, seq_col: str) -> DataFrame:
    """Cross-batch first-occurrence dedup keyed on ``key_col``.

    Each group is one key (content hash / pk); GroupState holds a single
    boolean. The first batch containing the key emits its minimal
    (seq, id) row; later batches are suppressed. In append mode the
    output stream is exactly the deduplicated stream.
    """

    def fn(key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        best_seq = None
        best_id = None
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            i = pdf[seq_col].astype("int64").idxmin()
            s, d = int(pdf[seq_col][i]), int(pdf[id_col][i])
            if best_seq is None or (s, d) < (best_seq, best_id):
                best_seq, best_id = s, d
        if state.exists or best_seq is None:
            yield pd.DataFrame({"group_key": pd.Series([], dtype="object"),
                                "first_id": pd.Series([], dtype="int64"),
                                "first_seq": pd.Series([], dtype="int64")})
            return
        state.update((True,))
        yield pd.DataFrame({"group_key": [str(key[0])],
                            "first_id": pd.Series([best_id], dtype="int64"),
                            "first_seq": pd.Series([best_seq], dtype="int64")})

    keyed = df.withColumn("group_key", F.col(key_col).cast("string"))
    return keyed.groupBy("group_key").applyInPandasWithState(
        fn, FIRST_SEEN_OUT, FIRST_SEEN_STATE, "append", GroupStateTimeout.NoTimeout
    )


def windowed_counts(df: DataFrame, window: str = "1 hour",
                    watermark_delay: str = "30 minutes") -> DataFrame:
    """T5/T9 streaming-native: event-time tumbling counts with a watermark.

    Append mode only emits a window once the watermark passes its end, and
    rows older than the watermark are dropped (the reference's stale-event
    drop, ``dispatcher.go:271-279``) — both behaviors come from
    ``withWatermark``, no custom code.
    """
    with_time = df.withColumn("commit_time", F.timestamp_micros(F.col("commit_ts")))
    return (
        with_time.withWatermark("commit_time", watermark_delay)
        .groupBy(F.window("commit_time", window).alias("w"), F.col("table_id"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            "table_id",
            "n_events",
        )
    )


LSH_INC_OUT = "bucket string, doc_a long, doc_b long"
LSH_INC_STATE = "docs string"


def lsh_incremental_pairs(bands_df: DataFrame, cap: int = 100) -> DataFrame:
    """Cross-batch incremental MinHash-LSH near-dup pairing: GroupState
    per (band, v) bucket holds its first ``cap`` member doc ids; each
    arriving doc pairs with every earlier member while the bucket is
    below cap, then the bucket saturates and later members are dropped
    (the *incremental* form of the batch pipeline's oversized-bucket
    drop — state stays bounded at cap ids per bucket forever).

    Deterministic by construction when the source delivers docs in
    doc_id order (commit-ordered chunks): new docs are processed sorted
    within each batch, so bucket rank == global doc_id rank and the
    emitted pair set equals the batch oracle's rank-capped pairing.
    ``bands_df``: streaming (doc_id, band, v) rows.
    """

    def fn(key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        docs: list[int] = []
        if state.exists:
            docs = [int(x) for x in state.get[0].split(",") if x]
        new = sorted({int(d) for pdf in pdfs for d in pdf["doc_id"]})
        out_a: list[int] = []
        out_b: list[int] = []
        for d in new:
            if len(docs) >= cap:
                break  # saturated bucket: later members are dropped
            out_a.extend(docs)
            out_b.extend([d] * len(docs))
            docs.append(d)
        state.update((",".join(str(x) for x in docs),))
        yield pd.DataFrame(
            {
                "bucket": pd.Series([str(key[0])] * len(out_a), dtype="object"),
                "doc_a": pd.Series(out_a, dtype="int64"),
                "doc_b": pd.Series(out_b, dtype="int64"),
            }
        )

    keyed = bands_df.withColumn(
        "bucket", F.concat_ws("|", F.col("band"), F.col("v"))
    )
    return keyed.groupBy("bucket").applyInPandasWithState(
        fn, LSH_INC_OUT, LSH_INC_STATE, "append", GroupStateTimeout.NoTimeout
    )


FLUSH_ACC_OUT = ("lane long, batch_seq long, n_txns long, n_rows long, "
                 "first_commit_ts long, last_commit_ts long, n_start_ts long")
#: carried worker state: accumulation counters + the open batch's distinct
#: startTs set (bounded: a batch holds <= max_rows+1 txns since each txn
#: has >= 1 row, so the comma-joined set never exceeds that)
FLUSH_ACC_STATE = ("cum long, ntxn long, first_ts long, last_ts long, "
                   "seq long, sts string")


def flush_batch_accounting(txns: DataFrame,
                           max_rows: int = 64) -> DataFrame:
    """Streaming form of :func:`tigate_spark.operators.txn.flush_batches`
    — the scale-honest one: the batch form materializes a whole lane in
    one Arrow group, while the reference worker streams its channel with
    O(1) memory (``mysql_worker.go:90-135``). Here GroupState per lane
    carries (cum, ntxn, first/last commit, batch_seq, open startTs set)
    across micro-batches, so memory is bounded by the OPEN batch
    (<= max_rows+1 txns), not the lane — exactly the worker loop's
    footprint. A sentinel row (``n_rows == 0``, max commit_ts) plays the
    reference's 10 ms delay-timer flush: it closes the trailing partial
    batch at end of stream.

    Exactness requires commit-ordered delivery: micro-batches must be
    commit-ts ranges in order (pinned-mtime part files, the established
    multi-batch harness); rows are re-sorted inside each micro-batch.
    """

    def fn(key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        lane = int(key[0])
        if state.exists:
            cum, ntxn, first, last, seq, sts_s = state.get
            sts = {int(x) for x in sts_s.split(",") if x}
            cum, ntxn, first, last, seq = (
                int(cum), int(ntxn), int(first), int(last), int(seq))
        else:
            cum, ntxn, first, last, seq, sts = 0, 0, 0, 0, 1, set()
        pdf = pd.concat(list(pdfs), ignore_index=True)
        pdf = pdf.sort_values(["commit_ts", "start_ts", "table_id"])
        out = []
        for commit_ts, start_ts, nr in zip(
            pdf["commit_ts"], pdf["start_ts"], pdf["n_rows"]
        ):
            if int(nr) == 0:
                # sentinel: the delay-timer flush — close the open batch
                if ntxn:
                    out.append((lane, seq, ntxn, cum, first, last, len(sts)))
                    seq, cum, ntxn, sts = seq + 1, 0, 0, set()
                continue
            if ntxn == 0:
                first = int(commit_ts)
            cum += int(nr)
            ntxn += 1
            last = int(commit_ts)
            sts.add(int(start_ts))
            if cum > max_rows:
                out.append((lane, seq, ntxn, cum, first, last, len(sts)))
                seq, cum, ntxn, sts = seq + 1, 0, 0, set()
        state.update((cum, ntxn, first, last, seq,
                      ",".join(str(x) for x in sorted(sts))))
        yield pd.DataFrame(
            out, columns=["lane", "batch_seq", "n_txns", "n_rows",
                          "first_commit_ts", "last_commit_ts", "n_start_ts"]
        )

    return txns.groupBy("lane").applyInPandasWithState(
        fn, FLUSH_ACC_OUT, FLUSH_ACC_STATE, "append",
        GroupStateTimeout.NoTimeout,
    )
