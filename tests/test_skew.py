"""R9 skew-splitting safety: salt derivation must stay in [0, n) for every
possible hash value, and the salted join must be row-identical to the plain
join (write_bytes_splitter.go parity — splitting may never change results).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tigate_spark.operators.skew import salted_sum_count, skew_split_join

INT_MIN = -(2**31)


def test_pmod_salt_in_range_for_int_minvalue(spark):
    """hash() can emit Int.MinValue, whose abs() is still negative — the
    adversarial value for the old abs(hash)%n salt. pmod must stay in
    range where the abs formula goes negative (silent row loss in the
    salted join)."""
    df = spark.range(1).select(F.lit(INT_MIN).cast("int").alias("h"))
    n = 8
    # the old abs(hash)%n formula fails on this value either way:
    # ANSI mode → ARITHMETIC_OVERFLOW crash; legacy mode → negative salt
    # (silent row loss in the salted join)
    try:
        old = df.select((F.abs(F.col("h")) % n).alias("s")).first()["s"]
        assert old < 0
    except Exception as e:  # noqa: BLE001 — captured ArithmeticException
        assert "ARITHMETIC_OVERFLOW" in str(e)
    new = df.select(F.pmod(F.col("h"), F.lit(n)).alias("s")).first()["s"]
    assert 0 <= new < n


def test_salt_column_always_in_range(spark):
    """The production salt expression over a wide value sweep never leaves
    [0, n_salts) — the invariant the replicated-dim join depends on."""
    n = 8
    df = spark.range(-100_000, 100_000).select(F.col("id").alias("seq"))
    salt = F.pmod(F.hash(F.col("seq")), F.lit(n))
    out = df.select(salt.alias("s")).agg(
        F.min("s").alias("lo"), F.max("s").alias("hi")
    ).first()
    assert out["lo"] >= 0 and out["hi"] < n


def test_skew_split_join_row_identity(spark):
    """Hot-key salted join == plain join, row for row (including the hot
    keys' full fan-out)."""
    fact = spark.range(0, 5000).select(
        (F.col("id") % 7).alias("k"),
        F.col("id").alias("seq"),
        (F.col("id") * 3).alias("v"),
    )
    dim = spark.range(0, 7).select(
        F.col("id").alias("k"), F.concat(F.lit("d"), F.col("id")).alias("name")
    )
    hot = [0, 1]  # ~2/7 of fact rows land on these keys
    got = skew_split_join(fact, dim, "k", hot, n_salts=8, salt_src="seq")
    exp = fact.join(dim, "k")
    assert got.count() == exp.count()
    assert got.exceptAll(exp).count() == 0
    assert exp.exceptAll(got).count() == 0


def test_salted_sum_matches_plain_agg(spark):
    df = spark.range(0, 20000).select(
        (F.col("id") % 3).alias("k"),
        F.col("id").alias("seq"),
        (F.col("id") % 100).alias("v"),
    )
    got = salted_sum_count(df, ["k"], "v", n_salts=16, salt_src="seq")
    exp = df.groupBy("k").agg(
        F.sum("v").alias("e_sum"), F.count(F.lit(1)).alias("e_n")
    )
    joined = got.join(exp, "k")
    assert joined.count() == 3
    assert joined.filter(
        (F.col("sum_v") != F.col("e_sum")) | (F.col("n_rows") != F.col("e_n"))
    ).count() == 0


def test_open_batch_rolls_at_max_batch_size(spark):
    """E4/E2 framing: a (topic, partition) lane longer than max_batch_size
    splits into multiple batches in seq order — per-lane batch state is
    bounded at any scale (open/encoder.go:122 MaxBatchSize roll)."""
    from tigate_spark.functions.encoders import (
        encode_open_batch_framed,
        encode_open_protocol_batch,
    )

    df = spark.range(0, 95).select(
        F.lit("t").alias("topic"),
        (F.col("id") % 2).alias("partition"),
        F.col("id").alias("seq"),
        F.concat(F.lit("k"), F.col("id")).alias("key"),
        F.concat(F.lit("v"), F.col("id")).alias("value"),
    )
    for out in (
        encode_open_protocol_batch(df, max_batch_size=10),
        encode_open_batch_framed(df, max_batch_size=10),
    ):
        rows = out.select("topic", "partition", "batch_seq", "n_messages").collect()
        # 2 lanes x ~48 msgs -> 5 batches each
        assert len(rows) == 10, rows
        assert all(r["n_messages"] <= 10 for r in rows)
        assert {r["batch_seq"] for r in rows} == {0, 1, 2, 3, 4}
