"""Skew-safe aggregation (R9's span-splitting intent, SURVEY §2.5).

Reference parity: hot tables are split into multiple spans by write volume
(``maintainer/split/write_bytes_splitter.go:30-122``,
``region_count_splitter.go:28-66``) so no single dispatcher owns a hot
key range. The Spark-native equivalents are (a) AQE skew handling —
enabled globally in :mod:`tigate_spark.session` — and (b) explicit
**salting** for aggregations whose group keys are pathologically hot:
two-stage partial→final aggregation over a salted key.

Salting only helps algebraic aggregates (sum/count/min/max — anything
with a merge function); the final stage re-aggregates the partials.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_sum_count(df: DataFrame, keys: list[str], value_col: str,
                     n_salts: int = 16, salt_src: str | None = None) -> DataFrame:
    """Two-stage skew-safe ``groupBy(keys).agg(sum, count)``.

    Stage 1 groups by ``(keys, salt)`` — a hot key fans out over
    ``n_salts`` reducers; stage 2 merges the ≤ ``n_salts`` partials per
    key. Deterministic salt (hash of ``salt_src`` or a row-spread column)
    keeps the result reproducible.
    """
    # pmod, not abs(hash)%n: hash() can return Int.MinValue, whose abs is
    # itself (negative) — pmod keeps the salt in [0, n_salts) always
    salt: Column = (
        F.pmod(F.hash(F.col(salt_src)), F.lit(n_salts))
        if salt_src is not None
        else (F.monotonically_increasing_id() % n_salts)
    )
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(*keys, "_salt")
        .agg(
            F.sum(value_col).alias("_psum"),
            F.count(F.lit(1)).alias("_pcnt"),
        )
    )
    return partial.groupBy(*keys).agg(
        F.sum("_psum").alias(f"sum_{value_col}"),
        F.sum("_pcnt").alias("n_rows"),
    )


def skew_split_join(fact: DataFrame, dim: DataFrame, key: str,
                    hot_keys: list, n_salts: int = 8,
                    salt_src: str = "seq") -> DataFrame:
    """Skew-safe inner equi join: split hot keys out, salt + replicate them.

    A plain shuffle join lands each hot key on ONE reducer. The classic
    rewrite (what AQE skew-join does adaptively, expressed explicitly for
    when the skew is known at plan time):

    - **hot keys**: fact rows get a deterministic salt in ``[0, n_salts)``;
      the matching dim rows are replicated once per salt value, so every
      salted partition still finds its match — the hot key now spreads
      over ``n_salts`` reducers;
    - **cold keys**: joined normally;
    - results unioned. Row-identical to ``fact.join(dim, key)``.

    Only the *hot-key* dim rows replicate (cold dim rows don't), so the
    overhead is ``|hot dim rows| × n_salts`` — negligible even at 100 TB.
    """
    hot_f = fact.filter(F.col(key).isin(hot_keys))
    cold_f = fact.filter(~F.col(key).isin(hot_keys))
    hot_d = dim.filter(F.col(key).isin(hot_keys))
    cold_d = dim.filter(~F.col(key).isin(hot_keys))

    # pmod: abs(Int.MinValue) is still negative → a negative salt would
    # match no replicated dim row and silently drop that fact row
    salt = F.pmod(F.hash(F.col(salt_src)), F.lit(n_salts))
    salted_fact = hot_f.withColumn("_salt", salt)
    replicated_dim = hot_d.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    hot_join = salted_fact.join(replicated_dim, [key, "_salt"]).drop("_salt")
    cold_join = cold_f.join(cold_d, key)
    return hot_join.unionByName(cold_join)
