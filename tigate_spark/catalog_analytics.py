"""Analytics catalog — window frames, deterministic sampling, approximate
sketches, interval joins, and state-GC accounting over the change stream
and the training-data tables (SURVEY §2.8 / §7: relational + pipeline
surface the Spark engine adds on top of the CDC core).

Determinism rules (so oracles hash-match): money is integer cents; ratios
are integer-scaled integer division (no float drift across partition
orders); sampling is md5-derived hash-mod (portable, replayable — the
pattern that scales to 100 TB because it needs no global state); approx
sketches emit exact values plus an error-bound boolean rather than the
sketch estimate itself (estimates differ across engines by design).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tigate_spark.catalog import register
from tigate_spark.functions.phash import h32, h32_sql
from tigate_spark.sources.batch import load_table
from tigate_spark.sources.changes import ORACLE_CHANGES_CTE, changes_stream

_HOUR_US = 3_600_000_000


# ==========================================================================
# Window-frame shapes
# ==========================================================================
@register(
    "window_lag_interarrival",
    ORACLE_CHANGES_CTE
    + """
SELECT seq, table_id, pk,
       commit_ts - lag(commit_ts) OVER (
         PARTITION BY table_id, pk ORDER BY commit_ts, seq
       ) AS interarrival_us,
       lead(seq) OVER (
         PARTITION BY table_id, pk ORDER BY commit_ts, seq
       ) AS next_seq
FROM changes
""",
    doc="lead/lag window: per-key inter-arrival gap + successor pointer in "
        "commit order — change-rate profiling over the event store order "
        "(eventstore/format.go:50-85 iteration order); one shuffle on the "
        "key, single sorted pass",
)
def window_lag_interarrival(spark: SparkSession, sf_dir: str) -> DataFrame:
    ch = changes_stream(spark, sf_dir)
    w = Window.partitionBy("table_id", "pk").orderBy("commit_ts", "seq")
    return ch.select(
        "seq", "table_id", "pk",
        (F.col("commit_ts") - F.lag("commit_ts").over(w)).alias("interarrival_us"),
        F.lead("seq").over(w).alias("next_seq"),
    )


@register(
    "window_range_1h_sum",
    ORACLE_CHANGES_CTE
    + """
SELECT seq,
       CAST(sum(value_cents) OVER (
         PARTITION BY table_id ORDER BY commit_ts
         RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW
       ) AS BIGINT) AS rolling_1h_cents
FROM changes
""",
    doc="RANGE-frame window: per-table rolling 1-hour value sum keyed by "
        "the commit timestamp itself (value-range frame, peers share the "
        "frame so ties are deterministic) — sliding-window analytics "
        "without a self-join; one shuffle on table_id",
)
def window_range_1h_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    ch = changes_stream(spark, sf_dir)
    w = (
        Window.partitionBy("table_id")
        .orderBy("commit_ts")
        .rangeBetween(-_HOUR_US, 0)
    )
    return ch.select(
        "seq", F.sum("value_cents").over(w).alias("rolling_1h_cents")
    )


@register(
    "window_ntile_rank",
    """
SELECT o_orderkey,
       ntile(4) OVER w AS quartile,
       CAST(round(percent_rank() OVER w * 10000) AS BIGINT) AS pct_rank_bp,
       CAST(round(cume_dist() OVER w * 10000) AS BIGINT) AS cume_bp,
       first_value(o_orderkey) OVER w AS segment_top_order
FROM orders
WINDOW w AS (PARTITION BY o_orderstatus
             ORDER BY o_totalprice DESC, o_orderkey)
""",
    doc="Rank-family windows (ntile / percent_rank / cume_dist / "
        "first_value) over a total order — distribution analytics in one "
        "shuffle; the order key (price, orderkey) is unique so every rank "
        "function is deterministic",
)
def window_ntile_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.col("o_totalprice").desc(), "o_orderkey"
    )
    return o.select(
        "o_orderkey",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w) * 10000).cast("bigint").alias("pct_rank_bp"),
        F.round(F.cume_dist().over(w) * 10000).cast("bigint").alias("cume_bp"),
        F.first("o_orderkey").over(w).alias("segment_top_order"),
    )


# ==========================================================================
# Deterministic sampling (training-pipeline surface)
# ==========================================================================
@register(
    "sample_hash_bucket",
    f"""
SELECT doc_id, lang FROM documents
WHERE {h32_sql('doc_id')} % 100 < 10
""",
    doc="Deterministic 10% hash-bucket sample of the corpus: md5-derived "
        "bucket per doc_id — replayable, engine-portable, no global state "
        "or RNG; at 100 TB this is a pure scan-filter (no shuffle), unlike "
        "reservoir/Bernoulli sampling which can't be re-derived",
)
def sample_hash_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.filter(h32(F.col("doc_id")) % 100 < 10).select("doc_id", "lang")


@register(
    "sample_stratified_hash",
    f"""
SELECT doc_id, lang FROM documents
WHERE {h32_sql('doc_id')} % 100 <
      CASE WHEN lang = 'en' THEN 5 ELSE 20 END
""",
    doc="Stratified deterministic sampling: per-stratum rates (downsample "
        "the dominant language, keep more of the rest) via the same "
        "hash-bucket trick — the class-rebalancing pattern for training "
        "mixes, still a stateless scan-filter at scale",
)
def sample_stratified_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    rate = F.when(F.col("lang") == "en", 5).otherwise(20)
    return docs.filter(h32(F.col("doc_id")) % 100 < rate).select("doc_id", "lang")


# ==========================================================================
# Approximate sketches (exact value + error-bound check)
# ==========================================================================
@register(
    "approx_distinct_users",
    ORACLE_CHANGES_CTE
    + """
SELECT table_id,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact,
       TRUE AS approx_within_10pct
FROM changes GROUP BY table_id
""",
    doc="HLL cardinality sketch (approx_count_distinct) validated against "
        "the exact distinct count: the entry emits the exact value plus a "
        "10%-error-bound boolean (default rsd is 5%, so the bound holds "
        "with overwhelming margin) — sketch estimates themselves differ "
        "across engines by design and can't hash-match; at 100 TB the "
        "sketch is the only option (fixed memory, one pass, mergeable "
        "across partitions)",
)
def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ch = changes_stream(spark, sf_dir)
    return (
        ch.groupBy("table_id")
        .agg(
            F.count_distinct("user_id").cast("bigint").alias("n_exact"),
            F.approx_count_distinct("user_id").alias("n_approx"),
        )
        .select(
            "table_id", "n_exact",
            (
                F.abs(F.col("n_approx") - F.col("n_exact")) * 10
                <= F.col("n_exact")
            ).alias("approx_within_10pct"),
        )
    )


@register(
    "approx_order_value_quantiles",
    """
SELECT o_orderstatus,
       CAST(round(quantile_cont(o_totalprice * 100, 0.25)) AS BIGINT) AS p25_cents,
       CAST(round(quantile_cont(o_totalprice * 100, 0.50)) AS BIGINT) AS p50_cents,
       CAST(round(quantile_cont(o_totalprice * 100, 0.75)) AS BIGINT) AS p75_cents,
       TRUE AS approx_in_iqr
FROM orders GROUP BY o_orderstatus
""",
    doc="Quantiles per group: exact interpolated percentiles (rounded to "
        "cents) plus a bound check that the t-digest/GK approx median "
        "(percentile_approx) lands inside the exact IQR — the approx "
        "sketch is the 100 TB path (one pass, mergeable), the exact form "
        "is the oracle-checkable witness",
)
def approx_order_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").withColumn(
        "price100", F.col("o_totalprice") * 100
    )
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.percentile("price100", 0.25).alias("p25_raw"),
            F.percentile("price100", 0.50).alias("p50_raw"),
            F.percentile("price100", 0.75).alias("p75_raw"),
            F.percentile_approx("price100", 0.5, 10000).alias("p50_approx"),
        )
        .select(
            "o_orderstatus",
            F.round("p25_raw").cast("bigint").alias("p25_cents"),
            F.round("p50_raw").cast("bigint").alias("p50_cents"),
            F.round("p75_raw").cast("bigint").alias("p75_cents"),
            (
                (F.col("p50_approx") >= F.col("p25_raw"))
                & (F.col("p50_approx") <= F.col("p75_raw"))
            ).alias("approx_in_iqr"),
        )
    )


# ==========================================================================
# Interval / band join
# ==========================================================================
@register(
    "join_interval_broadcast",
    ORACLE_CHANGES_CTE
    + """
, bounds AS (SELECT min(commit_ts) AS t0 FROM changes),
wins AS (
  SELECT w AS window_id,
         t0 + w * 432000000000 AS ws,
         t0 + w * 432000000000 + 86400000000 AS we
  FROM bounds, unnest(range(6)) AS u(w)
)
SELECT c.seq, w.window_id
FROM changes c JOIN wins w
  ON c.commit_ts >= w.ws AND c.commit_ts < w.we
""",
    doc="Interval (band) join: events matched into 6 one-day maintenance "
        "windows — the small interval dim broadcasts, so the inequality "
        "join is a broadcast nested-loop over 6 rows (never a shuffle); "
        "the scale pattern for calendar/SLA-window joins where the "
        "interval side is small",
)
def join_interval_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    ch = changes_stream(spark, sf_dir)
    t0 = ch.agg(F.min("commit_ts").alias("t0"))
    wins = (
        spark.range(6)
        .withColumnRenamed("id", "window_id")
        .crossJoin(F.broadcast(t0))
        .select(
            "window_id",
            (F.col("t0") + F.col("window_id") * 432_000_000_000).alias("ws"),
            (F.col("t0") + F.col("window_id") * 432_000_000_000 + 86_400_000_000).alias("we"),
        )
    )
    return ch.join(
        F.broadcast(wins),
        (F.col("commit_ts") >= F.col("ws")) & (F.col("commit_ts") < F.col("we")),
    ).select("seq", "window_id")


# ==========================================================================
# State GC accounting (T12)
# ==========================================================================
@register(
    "gc_eligible_tombstones",
    ORACLE_CHANGES_CTE
    + """
, ckpt AS (
  SELECT min(resolved) AS checkpoint_ts
  FROM (SELECT max(commit_ts) AS resolved FROM changes GROUP BY table_id)
)
SELECT table_id,
       count(*) AS n_tombstones,
       CAST(sum(CASE WHEN commit_ts <= checkpoint_ts THEN 1 ELSE 0 END) AS BIGINT) AS n_gc_eligible,
       min(seq) AS first_seq
FROM changes, ckpt
WHERE op = 'D'
GROUP BY table_id, checkpoint_ts
""",
    doc="T12 event-store GC accounting: delete tombstones at/below the "
        "global checkpoint (two-level min-of-max watermark, "
        "maintainer.go:74,164-171) are reclaimable — the batch twin of "
        "the streaming vacuum (logservice/eventstore/gc.go); checkpoint "
        "is a 1-row broadcast, the rest is one partial/final agg",
)
def gc_eligible_tombstones(spark: SparkSession, sf_dir: str) -> DataFrame:
    ch = changes_stream(spark, sf_dir)
    ckpt = (
        ch.groupBy("table_id")
        .agg(F.max("commit_ts").alias("resolved"))
        .agg(F.min("resolved").alias("checkpoint_ts"))
    )
    return (
        ch.filter(F.col("op") == "D")
        .crossJoin(F.broadcast(ckpt))
        .groupBy("table_id")
        .agg(
            F.count(F.lit(1)).alias("n_tombstones"),
            F.sum(
                F.when(F.col("commit_ts") <= F.col("checkpoint_ts"), 1).otherwise(0)
            ).cast("bigint").alias("n_gc_eligible"),
            F.min("seq").alias("first_seq"),
        )
    )
