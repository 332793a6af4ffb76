"""Property-based test: ordered last-writer-wins apply vs a Python model.

Hypothesis generates adversarial change sequences (colliding keys, equal
commit timestamps, shuffled arrival order); `materialize` must agree with
a sequential replay that applies changes in the exact total order
(commit_ts, start_ts, D<U<I, seq) — the invariant the reference's LSM key
encodes (``logservice/eventstore/format.go:50-85``).
"""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tigate_spark.operators.apply import materialize

OP_RANK = {"D": 1, "U": 2, "I": 3}

change = st.tuples(
    st.integers(0, 1),      # table_id
    st.integers(0, 3),      # pk (few keys → many collisions)
    st.sampled_from("IUD"),  # op
    st.integers(0, 4),      # commit_ts (tiny range → ts ties)
    st.integers(0, 2),      # start_ts
    st.integers(0, 50),     # value
)


def _model(rows):
    """Sequential replay in total order — the ground truth."""
    state = {}
    for r in sorted(rows, key=lambda r: (r["commit_ts"], r["start_ts"],
                                         OP_RANK[r["op"]], r["seq"])):
        k = (r["table_id"], r["pk"])
        if r["op"] == "D":
            state[k] = None
        else:
            state[k] = r["value_cents"]
    return {k: v for k, v in state.items() if v is not None}


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@pytest.mark.slow
@given(st.lists(change, min_size=1, max_size=60))
def test_materialize_matches_sequential_replay(spark_prop, data):
    rows = [
        dict(table_id=t, pk=p, op=o, commit_ts=c, start_ts=s,
             seq=i, value_cents=v)
        for i, (t, p, o, c, s, v) in enumerate(data)
    ]
    df = spark_prop.createDataFrame(pd.DataFrame(rows))
    got = {
        (r["table_id"], r["pk"]): r["value_cents"]
        for r in materialize(df, ["value_cents"]).collect()
    }
    assert got == _model(rows)


def test_scd2_current_rows_equal_materialized_state(spark, sf_dir):
    """SCD2 invariants: (a) the open (is_current) intervals are exactly the
    materialized live rows — same keys, same payloads; (b) no interval is
    negative (ties at one commit_ts may produce zero-length versions)."""
    from tigate_spark.operators.apply import materialize, scd2_history
    from tigate_spark.sources.changes import changes_stream

    cols = ["event_type", "value_cents"]
    ch = changes_stream(spark, sf_dir)
    h = scd2_history(ch, cols)
    cur = h.filter("is_current").select("table_id", "pk", *cols)
    live = materialize(ch, cols).select("table_id", "pk", *cols)
    assert cur.count() == live.count()
    assert cur.exceptAll(live).count() == 0
    assert h.filter("valid_to is not null and valid_from > valid_to").count() == 0


@pytest.mark.parametrize("frac", [0.1, 0.5, 0.9])
def test_incremental_join_invariant_under_split(spark, sf_dir, frac):
    """Join-view IVM: the touched-key partial recompute must equal the
    direct join of final states at ANY base/delta split point — inserts,
    updates, and tombstones land on both sides of the cut."""
    import pyspark.sql.functions as F

    from tigate_spark.sources.changes import changes_stream

    ch = changes_stream(spark, sf_dir).filter(F.col("table_id").isin(0, 1))

    def lww(df):
        from tigate_spark.operators.ordering import op_rank_col

        order_key = F.struct("commit_ts", "start_ts", op_rank_col(), "seq")
        w = df.groupBy("table_id", "pk").agg(
            F.max_by(F.struct("op", "commit_ts", "value_cents"), order_key).alias("w")
        )
        return w.select(
            "table_id", "pk", F.col("w.op").alias("op"),
            F.col("w.commit_ts").alias("commit_ts"),
            F.col("w.value_cents").alias("value_cents"),
        ).filter(F.col("op") != "D")

    def view(state):
        l = state.filter(F.col("table_id") == 0).select(
            "pk", F.col("commit_ts").alias("lc"), F.col("value_cents").alias("lv"))
        r = state.filter(F.col("table_id") == 1).select(
            "pk", F.col("commit_ts").alias("rc"), F.col("value_cents").alias("rv"))
        return l.join(r, "pk")

    lo, hi = ch.agg(F.min("commit_ts"), F.max("commit_ts")).first()
    cut = int(lo + (hi - lo) * frac)
    base = ch.filter(F.col("commit_ts") <= cut)
    delta = ch.filter(F.col("commit_ts") > cut)
    touched = delta.select("pk").distinct()
    incr = (
        view(lww(base)).join(touched, "pk", "left_anti")
        .unionByName(view(lww(ch)).join(touched, "pk", "left_semi"))
    )
    direct = view(lww(ch))
    a = sorted(map(tuple, incr.collect()))
    b = sorted(map(tuple, direct.collect()))
    assert a == b
