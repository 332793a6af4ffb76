"""Relational query catalog — the full relational algebra the PySpark
engine exposes natively (SURVEY §2.8: the reference has no relational
operators; these demonstrate the algebra the Spark engine adds on top of
the CDC core, and serve as the bench workload).

Money math is integer cents end-to-end so oracles hash-match exactly.
Scale notes inline: small dims broadcast; AQE handles skew + partition
coalescing; filters sit directly on scan columns so they push down.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tigate_spark.catalog import register
from tigate_spark.sources.batch import load_table


def _cents(col):
    return F.round(col * 100).cast("bigint")


@register(
    "tpch_q1_pricing_summary",
    """
SELECT l_returnflag, l_linestatus,
       sum(CAST(round(l_quantity) AS BIGINT)) AS sum_qty,
       sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS sum_base_price_cents,
       sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS sum_disc_price_cents,
       sum(CAST(round(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100) AS BIGINT)) AS sum_charge_cents,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
""",
    doc="Agg pipeline: scan→filter(pushdown)→partial/final hash agg (TPC-H Q1 shape)",
    bench=True,
)
def tpch_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.round(F.col("l_quantity")).cast("bigint")).alias("sum_qty"),
            F.sum(_cents(F.col("l_extendedprice"))).alias("sum_base_price_cents"),
            F.sum(_cents(disc)).alias("sum_disc_price_cents"),
            F.sum(_cents(charge)).alias("sum_charge_cents"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "tpch_q4_order_priority",
    """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1995-01-01'
  AND o_orderdate < TIMESTAMP '1995-04-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY o_orderpriority
""",
    doc="EXISTS-subquery shape (TPC-H Q4): date-windowed orders LEFT SEMI join "
        "a filtered lineitem — the semi join never materializes match "
        "multiplicity, both filters push to their scans, and the join "
        "co-shuffles on orderkey (testdata has no commitdate/receiptdate; "
        "l_returnflag='R' stands in as the EXISTS predicate)",
)
def tpch_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    windowed = o.filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1995-04-01").cast("timestamp"))
    )
    returned = li.filter(F.col("l_returnflag") == "R").select("l_orderkey")
    return (
        windowed.join(
            returned, windowed.o_orderkey == returned.l_orderkey, "left_semi"
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@register(
    "tpch_q6_forecast_revenue",
    """
SELECT sum(CAST(round(l_extendedprice * l_discount * 100) AS BIGINT)) AS revenue_cents,
       count(*) AS n
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1994-01-01'
  AND l_shipdate < TIMESTAMP '1995-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
    doc="Pure scan-filter-agg (TPC-H Q6 shape): every predicate sits on a scan "
        "column so all four push into the parquet reader; single partial/final agg, "
        "no shuffle of data rows — the plan to beat at 100 TB is IO-bound",
    bench=True,
)
def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1994-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1995-01-01").cast("timestamp"))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(_cents(F.col("l_extendedprice") * F.col("l_discount"))).alias(
                "revenue_cents"
            ),
            F.count(F.lit(1)).alias("n"),
        )
    )


@register(
    "tpch_q3_shipping_priority",
    """
SELECT l.l_orderkey AS l_orderkey,
       sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)) AS revenue_cents,
       o.o_orderdate AS o_orderdate
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1997-06-15'
  AND l.l_shipdate > TIMESTAMP '1997-06-15'
GROUP BY l.l_orderkey, o.o_orderdate
ORDER BY revenue_cents DESC, l_orderkey
LIMIT 10
""",
    doc="3-way join + agg + deterministic top-k (TPC-H Q3 shape); customer "
        "broadcasts, orders⋈lineitem co-shuffles on orderkey",
    bench=True,
)
def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1997-06-15").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1997-06-15").cast("timestamp")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum(_cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue_cents"))
        .select("l_orderkey", "revenue_cents", "o_orderdate")
        .orderBy(F.col("revenue_cents").desc(), "l_orderkey")
        .limit(10)
    )


@register(
    "tpch_q5_local_supplier",
    """
SELECT n.n_name AS n_name,
       sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)) AS revenue_cents
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
GROUP BY n.n_name
""",
    doc="6-way star join: dims broadcast, facts co-shuffle (TPC-H Q5 shape)",
    bench=True,
)
def tpch_q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(_cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue_cents"))
    )


@register(
    "window_topn_orders_per_customer",
    """
SELECT o_custkey, o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) AS total_cents, rn
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
) WHERE rn <= 3
""",
    doc="Window top-N per group (row_number) — single shuffle on the group key",
)
def window_topn_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", _cents(F.col("o_totalprice")).alias("total_cents"), "rn")
    )


@register(
    "setop_distinct_segments",
    """
SELECT c_mktsegment FROM customer WHERE c_acctbal > 5000
EXCEPT
SELECT c_mktsegment FROM customer WHERE c_custkey < 5
""",
    doc="Set operators (EXCEPT/DISTINCT) over dimension scans",
)
def setop_distinct_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    pos = c.filter(F.col("c_acctbal") > 5000).select("c_mktsegment")
    neg = c.filter(F.col("c_custkey") < 5).select("c_mktsegment")
    return pos.subtract(neg)  # EXCEPT (distinct) semantics


@register(
    "agg_events_per_type_hour",
    """
SELECT event_type,
       epoch_us(ts) - epoch_us(ts) % 3600000000 AS hour_us,
       count(*) AS n,
       sum(CAST(round(value * 100) AS BIGINT)) AS value_cents
FROM events GROUP BY 1, 2
""",
    doc="Streaming-shaped windowed aggregation in batch form (hourly tumbling)",
    bench=True,
)
def agg_events_per_type_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    us = F.expr("ts div 1000")
    return (
        ev.groupBy(
            "event_type",
            (us - us % 3_600_000_000).alias("hour_us"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("value_cents"),
        )
    )
