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
from tigate_spark.functions.rounding import cents as _cents
from tigate_spark.functions.rounding import round_half_away_bigint
from tigate_spark.functions.rounding import round_half_up_bigint
from tigate_spark.sources.batch import load_table
from tigate_spark.sources.changes import event_us


@register(
    "tpch_q1_pricing_summary",
    """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_price_cents,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS sum_disc_price_cents,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100) AS BIGINT)) AS BIGINT) AS sum_charge_cents,
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
            F.sum(round_half_up_bigint(F.col("l_quantity"))).alias("sum_qty"),
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
SELECT CAST(sum(CAST(round(l_extendedprice * l_discount * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
       count(*) AS n
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1995-01-01'
  AND l_shipdate < TIMESTAMP '1996-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
    doc="Pure scan-filter-agg (TPC-H Q6 shape): every predicate sits on a scan "
        "column so all four push into the parquet reader; single partial/final agg, "
        "no shuffle of data rows — the plan to beat at 100 TB is IO-bound "
        "(dates shifted into the testdata's 1995-2001 shipdate range so the "
        "query aggregates real rows, not an empty scan)",
    bench=True,
)
def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp"))
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
       CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
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
        "is SF-proportional so it stays size-decided (AQE broadcasts it at "
        "test SF, co-shuffles at 100 TB), orders⋈lineitem co-shuffles on "
        "orderkey",
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
        .join(c, o.o_custkey == c.c_custkey)
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
       CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
GROUP BY n.n_name
""",
    doc="6-way star join (TPC-H Q5 shape): fixed-size dims (nation, region) "
        "force-broadcast; customer/supplier are SF-proportional so they stay "
        "size-decided; facts co-shuffle",
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
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            s,
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
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
FROM events GROUP BY 1, 2
""",
    doc="Streaming-shaped windowed aggregation in batch form (hourly tumbling)",
    bench=True,
)
def agg_events_per_type_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    us = event_us(ev)
    return (
        ev.groupBy(
            "event_type",
            (us - us % 3_600_000_000).alias("hour_us"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(round_half_away_bigint(F.col("value") * 100)).alias("value_cents"),
        )
    )


@register(
    "tpch_q10_returned_items",
    """
SELECT c.c_custkey AS c_custkey, c.c_name AS c_name, n.n_name AS n_name,
       CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE o.o_orderdate >= TIMESTAMP '1995-01-01'
  AND o.o_orderdate < TIMESTAMP '1995-07-01'
  AND l.l_returnflag = 'R'
GROUP BY 1, 2, 3
ORDER BY revenue_cents DESC, c_custkey
LIMIT 20
""",
    doc="Top returned-revenue customers (TPC-H Q10 shape): fact⋈fact "
        "co-shuffles on orderkey, nation broadcasts (customer stays "
        "size-decided), deterministic "
        "top-20 — at 100 TB the only big exchange is orders⋈lineitem",
)
def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1995-07-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(_cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue_cents"))
        .orderBy(F.col("revenue_cents").desc(), "c_custkey")
        .limit(20)
    )


@register(
    "tpch_q12_priority_by_status",
    """
SELECT l_linestatus,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders JOIN lineitem ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
GROUP BY l_linestatus
""",
    doc="Join + conditional aggregation (TPC-H Q12 shape; l_linestatus "
        "stands in for l_shipmode which the testdata lacks): shipdate "
        "filter pushes to the lineitem scan, join co-shuffles on orderkey, "
        "CASE-sums fold into one partial/final agg",
)
def tpch_q12_priority_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("bigint").alias("low_line_count"),
        )
    )


@register(
    "tpch_q14_promo_revenue",
    """
SELECT CAST(sum(CASE WHEN p_type = 'PROMO'
                     THEN CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
                     ELSE 0 END) AS BIGINT) AS promo_cents,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS total_cents,
       CAST(sum(CASE WHEN p_type = 'PROMO'
                     THEN CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
                     ELSE 0 END) * 100000 // sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS promo_share_hbp
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE l_shipdate >= TIMESTAMP '1995-03-01'
  AND l_shipdate < TIMESTAMP '1995-04-01'
""",
    doc="Promo revenue share (TPC-H Q14 shape): part is SF-proportional "
        "(~2.6 B rows at the 100 TB design point) so the join is "
        "size-decided — AQE broadcasts at test SF, co-shuffles at scale; "
        "the ratio is integer cents * 1e5 // "
        "total (exact integer math, no float drift across partition "
        "orders) — hbp = hundredths of a basis point",
)
def tpch_q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1995-04-01").cast("timestamp"))
    )
    cents = _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    promo = F.when(F.col("p_type") == "PROMO", cents).otherwise(F.lit(0).cast("bigint"))
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .agg(
            F.sum(promo).alias("promo_cents"),
            F.sum(cents).alias("total_cents"),
        )
        .select(
            "promo_cents",
            "total_cents",
            F.expr("promo_cents * 100000 div total_cents").alias("promo_share_hbp"),
        )
    )


@register(
    "tpch_q16_supplier_cnt",
    """
SELECT p_brand, p_size, CAST(count(DISTINCT ps.l_suppkey) AS BIGINT) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
JOIN part ON p_partkey = ps.l_partkey
WHERE p_brand <> 'Brand#1'
  AND p_type <> 'PROMO'
  AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
  AND ps.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_size
""",
    doc="NOT-IN + count-distinct (TPC-H Q16 shape): lineitem distinct "
        "(part,supp) pairs stand in for partsupp; the NOT IN becomes a "
        "LEFT ANTI join — supplier and part are SF-proportional so both "
        "joins stay size-decided (AQE broadcasts at test SF); "
        "count(DISTINCT) is a two-stage agg on the pair key",
)
def tpch_q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22))
    )
    bad_supp = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    ps = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey").distinct()
    )
    return (
        ps.join(bad_supp, ps.l_suppkey == bad_supp.s_suppkey, "left_anti")
        .join(p, F.col("l_partkey") == p.p_partkey)
        .groupBy("p_brand", "p_size")
        .agg(F.count_distinct(F.col("l_suppkey")).cast("bigint").alias("supplier_cnt"))
    )


@register(
    "tpch_q18_large_volume_orders",
    """
SELECT c.c_custkey AS c_custkey, o.o_orderkey AS o_orderkey,
       CAST(round(o.o_totalprice * 100) AS BIGINT) AS total_cents,
       CAST(sum(CAST(round(l.l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
GROUP BY 1, 2, 3
HAVING sum(CAST(round(l.l_quantity) AS BIGINT)) > 200
""",
    doc="Group-by + HAVING over a join (TPC-H Q18 shape): the quantity "
        "pre-aggregation happens on the lineitem side of the shuffle "
        "(partial agg before the join at scale); customer stays "
        "size-decided (SF-proportional)",
)
def tpch_q18_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    # pre-aggregate quantities per order BEFORE joining: shrinks the join
    # input from line-level to order-level (the scale move for Q18)
    qty = (
        li.groupBy("l_orderkey")
        .agg(F.sum(round_half_up_bigint(F.col("l_quantity"))).alias("sum_qty"))
        .filter(F.col("sum_qty") > 200)
    )
    return (
        qty.join(o, qty.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_custkey", "o_orderkey",
            _cents(F.col("o_totalprice")).alias("total_cents"), "sum_qty",
        )
    )


@register(
    "tpch_q19_disjunctive_filter",
    """
SELECT CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
       count(*) AS n
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 5 AND 20 AND l_quantity BETWEEN 10 AND 30)
   OR (p_type = 'PROMO' AND l_quantity >= 25)
""",
    doc="Disjunctive multi-table predicates (TPC-H Q19 shape): part is "
        "SF-proportional so the join stays size-decided; Catalyst pushes "
        "the single-side conjuncts it can derive and evaluates the OR "
        "post-join in codegen",
)
def tpch_q19_disjunctive_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    j = li.join(p, li.l_partkey == p.p_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 10) & F.col("l_quantity").between(1, 20))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(5, 20) & F.col("l_quantity").between(10, 30))
        | ((F.col("p_type") == "PROMO") & (F.col("l_quantity") >= 25))
    )
    return j.filter(cond).agg(
        F.sum(_cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue_cents"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "tpch_q22_idle_customers",
    """
WITH bal AS (
  SELECT avg(CAST(round(c_acctbal * 100) AS BIGINT)) AS avg_cents
  FROM customer WHERE c_acctbal > 0
)
SELECT c_mktsegment, count(*) AS numcust,
       CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS total_cents
FROM customer, bal
WHERE CAST(round(c_acctbal * 100) AS BIGINT) > avg_cents
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '1999-01-01')
GROUP BY c_mktsegment
""",
    doc="Scalar-subquery threshold + anti join (TPC-H Q22 shape): "
        "well-funded customers with no *recent* orders (every testdata "
        "customer has some order, so 'idle' = nothing since 1999); the avg "
        "is over exact integer cents (deterministic across partition "
        "orders), broadcast as a 1-row dim; NOT EXISTS is a LEFT ANTI join "
        "on the date-filtered orders key set",
)
def tpch_q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").withColumn(
        # acctbal goes NEGATIVE in real TPC-H data — sign-aware round (r18)
        "bal_cents", round_half_away_bigint(F.col("c_acctbal") * 100)
    )
    o_keys = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp")
    ).select("o_custkey")
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(
        F.avg("bal_cents").alias("avg_cents")
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("bal_cents") > F.col("avg_cents"))
        .join(o_keys, c.c_custkey == o_keys.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum("bal_cents").alias("total_cents"),
        )
    )


@register(
    "tpch_q2_top_supplier_per_part",
    """
WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
ranked AS (
  SELECT p.p_partkey, s.s_suppkey, s.s_name,
         CAST(round(s.s_acctbal * 100) AS BIGINT) AS acctbal_cents,
         row_number() OVER (PARTITION BY p.p_partkey
                            ORDER BY s.s_acctbal DESC, s.s_suppkey) AS rn
  FROM ps
  JOIN part p ON p.p_partkey = ps.l_partkey
  JOIN supplier s ON s.s_suppkey = ps.l_suppkey
  WHERE p.p_size = 5
)
SELECT p_partkey, s_suppkey, s_name, acctbal_cents
FROM ranked WHERE rn = 1
""",
    doc="Correlated-subquery shape (TPC-H Q2): best supplier per part "
        "rewritten as a window top-1 over the derived part⋈supplier pairs "
        "— one shuffle on p_partkey instead of a per-row subquery; part "
        "and supplier are SF-proportional so both joins stay size-decided",
)
def tpch_q2_top_supplier_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").filter(F.col("p_size") == 5)
    s = load_table(spark, sf_dir, "supplier")
    ps = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey").distinct()
    )
    w = Window.partitionBy("p_partkey").orderBy(
        F.col("s_acctbal").desc(), "s_suppkey"
    )
    return (
        ps.join(p, ps.l_partkey == p.p_partkey)
        .join(s, ps.l_suppkey == s.s_suppkey)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "p_partkey", "s_suppkey", "s_name",
            # acctbal goes NEGATIVE in real TPC-H data — sign-aware round (r18)
            round_half_away_bigint(F.col("s_acctbal") * 100).alias("acctbal_cents"),
        )
    )


@register(
    "tpch_q7_nation_volume",
    """
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       year(l.l_shipdate) AS l_year,
       CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation sn ON s.s_nationkey = sn.n_nationkey
JOIN nation cn ON c.c_nationkey = cn.n_nationkey
WHERE (sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
   OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1')
GROUP BY 1, 2, 3
""",
    doc="Cross-nation volume (TPC-H Q7 shape): nation joined twice under "
        "different roles (supplier vs customer side) with a disjunctive "
        "pair filter; the two nation roles broadcast, customer/supplier "
        "stay size-decided, facts co-shuffle once on orderkey",
)
def tpch_q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    sn = n.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))
    cn = n.select(F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation"))
    pair = (
        ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
        | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.sum(_cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue_cents"))
    )


@register(
    "tpch_q8_market_share",
    """
SELECT CAST(EXTRACT(YEAR FROM o.o_orderdate) AS INT) AS o_year,
       CAST(sum(CASE WHEN ns.n_name = 'NATION_3'
                     THEN CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)
                     ELSE 0 END) AS BIGINT) AS nation_cents,
       CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)) AS BIGINT) AS total_cents
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey AND p.p_type = 'ECONOMY'
JOIN orders o ON o.o_orderkey = l.l_orderkey
  AND o.o_orderdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1996-12-31'
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation nc ON nc.n_nationkey = c.c_nationkey
JOIN region r ON r.r_regionkey = nc.n_regionkey AND r.r_name = 'ASIA'
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation ns ON ns.n_nationkey = s.s_nationkey
GROUP BY 1
""",
    doc="National market share (TPC-H Q8 shape): 8-way join with nation in "
        "two roles (customer-side prunes via region, supplier-side feeds the "
        "CASE numerator); fixed-size dims (nation, region) force-broadcast, "
        "part/customer/supplier are SF-proportional so they stay "
        "size-decided (AQE broadcasts them at test SF, shuffles at 100 TB); "
        "numerator/"
        "denominator emitted as exact cents (share = ratio downstream)",
)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") <= F.lit("1996-12-31").cast("timestamp"))
    )
    c = load_table(spark, sf_dir, "customer")
    nc = load_table(spark, sf_dir, "nation").alias("nc")
    ns = load_table(spark, sf_dir, "nation").alias("ns")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    s = load_table(spark, sf_dir, "supplier")
    vol = _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(nc), F.col("c_nationkey") == F.col("nc.n_nationkey"))
        .join(F.broadcast(r), F.col("nc.n_regionkey") == r.r_regionkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("ns.n_nationkey"))
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            F.sum(
                F.when(F.col("ns.n_name") == "NATION_3", vol).otherwise(F.lit(0))
            ).cast("bigint").alias("nation_cents"),
            F.sum(vol).cast("bigint").alias("total_cents"),
        )
    )


@register(
    "tpch_q9_product_profit",
    """
SELECT ns.n_name AS nation, CAST(EXTRACT(YEAR FROM o.o_orderdate) AS INT) AS o_year,
       CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)) AS BIGINT) AS profit_cents
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey AND p.p_name LIKE '%red%'
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation ns ON ns.n_nationkey = s.s_nationkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
GROUP BY 1, 2
""",
    doc="Product-type profit (TPC-H Q9 shape): LIKE-pattern part prune + "
        "supplier-nation rollup by year; no partsupp table in testdata, so "
        "profit omits the supplycost term (documented stand-in, same join "
        "tree); nation broadcasts, part/supplier stay size-decided, the "
        "orders join is the one big shuffle",
)
def tpch_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    s = load_table(spark, sf_dir, "supplier")
    ns = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders")
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(ns), F.col("s_nationkey") == ns.n_nationkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(
            F.sum(_cents(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
            .cast("bigint").alias("profit_cents")
        )
    )


@register(
    "tpch_q11_important_stock",
    """
WITH ps AS (
  SELECT l.l_partkey, CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS value_cents
  FROM lineitem l
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey AND n.n_name = 'NATION_1'
  GROUP BY 1
)
SELECT l_partkey, value_cents FROM ps
WHERE value_cents > (SELECT CAST(round(avg(value_cents) * 2.0) AS BIGINT) FROM ps)
""",
    doc="Important-stock scalar threshold (TPC-H Q11 shape): per-part value "
        "held by one nation's suppliers, kept only when above a threshold "
        "derived from a global re-agg broadcast back as the HAVING bound — "
        "2x the mean part value rather than TPC-H's fixed fraction of the "
        "total, so the predicate stays non-trivial at every SF (a fixed "
        "fraction goes empty as part count grows); lineitem⋈supplier⋈"
        "nation stands in for partsupp (no partsupp table in testdata)",
)
def tpch_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_1")
    ps = (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .groupBy("l_partkey")
        .agg(F.sum(_cents(F.col("l_extendedprice"))).alias("value_cents"))
    )
    thresh = ps.agg(
        F.round(F.avg("value_cents") * 2.0).cast("bigint").alias("thresh_cents")
    )
    return (
        ps.crossJoin(F.broadcast(thresh))
        .filter(F.col("value_cents") > F.col("thresh_cents"))
        .select("l_partkey", "value_cents")
    )


@register(
    "tpch_q13_customer_distribution",
    """
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM (
  SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS c_count
  FROM customer c
  LEFT JOIN orders o ON o.o_custkey = c.c_custkey
                    AND o.o_orderpriority <> '1-URGENT'
  GROUP BY 1
) t
GROUP BY 1
""",
    doc="Customer order-count distribution (TPC-H Q13 shape): left outer "
        "join with a join-side-only predicate (kept customers with zero "
        "matching orders count 0), then a second aggregation over the "
        "first's output — the classic double-agg; count(o_orderkey) skips "
        "NULLs from the outer join by definition",
)
def tpch_q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").cast("bigint").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).cast("bigint").alias("custdist")
    )


@register(
    "tpch_q15_top_supplier",
    """
WITH revenue AS (
  SELECT l_suppkey,
         CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS total_cents
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY 1
)
SELECT s.s_suppkey, s.s_name, r.total_cents
FROM revenue r JOIN supplier s ON s.s_suppkey = r.l_suppkey
WHERE r.total_cents = (SELECT max(total_cents) FROM revenue)
""",
    doc="Top supplier by quarterly revenue (TPC-H Q15 shape): the revenue "
        "'view' is computed once and reused for both the max scalar and the "
        "final join (Spark reuses the exchange); max broadcasts as a 1-row "
        "dim; ties all surface (deterministic either way)",
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    revenue = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(
            F.sum(_cents(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
            .alias("total_cents")
        )
    )
    best = revenue.agg(F.max("total_cents").alias("max_cents"))
    winners = (
        revenue.crossJoin(F.broadcast(best))
        .filter(F.col("total_cents") == F.col("max_cents"))
    )
    # winners is ~1 row: broadcast IT into supplier, not the reverse
    return s.join(F.broadcast(winners), F.col("l_suppkey") == s.s_suppkey).select(
        "s_suppkey", "s_name", "total_cents"
    )


@register(
    "tpch_q17_small_quantity_revenue",
    """
SELECT CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS total_cents,
       CAST(count(*) AS BIGINT) AS n
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey AND p.p_brand = 'Brand#3'
WHERE l.l_quantity < (SELECT 0.2 * avg(l2.l_quantity)
                      FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
""",
    doc="Small-quantity-order revenue (TPC-H Q17 shape): correlated avg "
        "subquery decorrelated as a window avg over l_partkey AFTER the "
        "brand prune — a brand-filtered part join keeps every lineitem of "
        "each surviving part, so the per-part avg over the pruned subset "
        "equals the avg over all of lineitem (one shuffle on the small "
        "subset, no second lineitem scan, nothing broadcast that grows "
        "with the part count)",
)
def tpch_q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3")
    w = Window.partitionBy("l_partkey")
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .withColumn("qty_thresh", F.avg("l_quantity").over(w) * 0.2)
        .filter(F.col("l_quantity") < F.col("qty_thresh"))
        .agg(
            F.sum(_cents(F.col("l_extendedprice"))).cast("bigint").alias("total_cents"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
        )
    )


@register(
    "tpch_q20_part_promotion",
    """
WITH ps AS (
  SELECT l_partkey, l_suppkey,
         CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS avail_qty,
         CAST(sum(CASE WHEN l_shipdate >= TIMESTAMP '1996-01-01'
                        AND l_shipdate < TIMESTAMP '1997-01-01'
                       THEN CAST(round(l_quantity) AS BIGINT) ELSE 0 END) AS BIGINT) AS qty_1996
  FROM lineitem GROUP BY 1, 2
)
SELECT DISTINCT s.s_suppkey, s.s_name
FROM ps
JOIN part p ON p.p_partkey = ps.l_partkey AND p.p_name LIKE 'red%'
JOIN supplier s ON s.s_suppkey = ps.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey AND n.n_name = 'NATION_2'
WHERE ps.avail_qty > ps.qty_1996 / 2.0
""",
    doc="Part-promotion supplier screen (TPC-H Q20 shape): nested IN-chains "
        "become semi-join chains — (part,supp) availability from lineitem "
        "stands in for partsupp (no partsupp table), the correlated "
        "'availqty > half of the year's shipments' subquery is a same-group "
        "conditional sum, then part-name and nation prunes; DISTINCT "
        "collapses multi-part suppliers (the semi-join effect)",
)
def tpch_q20_part_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("red%"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_2")
    qty96 = F.when(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp")),
        round_half_up_bigint(F.col("l_quantity")),
    ).otherwise(F.lit(0))
    ps = (
        li.groupBy("l_partkey", "l_suppkey")
        .agg(
            F.sum(round_half_up_bigint(F.col("l_quantity"))).alias("avail_qty"),
            F.sum(qty96).alias("qty_1996"),
        )
    )
    return (
        ps.filter(F.col("avail_qty") > F.col("qty_1996") / 2.0)
        .join(p, F.col("l_partkey") == p.p_partkey)
        .join(s, F.col("l_suppkey") == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .select("s_suppkey", "s_name")
        .distinct()
    )


@register(
    "tpch_q21_waiting_suppliers",
    """
SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
FROM lineitem l1
JOIN orders o ON o.o_orderkey = l1.l_orderkey AND o.o_orderstatus = 'F'
JOIN supplier s ON s.s_suppkey = l1.l_suppkey
WHERE l1.l_returnflag = 'R'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_returnflag = 'R')
GROUP BY 1
""",
    doc="Suppliers-who-kept-waiting (TPC-H Q21 shape): EXISTS → LEFT SEMI "
        "and NOT EXISTS → LEFT ANTI self-joins on orderkey with a "
        "supplier-inequality residual (hash join on the equi key, residual "
        "evaluated in the join); l_returnflag='R' stands in for the "
        "late-receipt predicate (testdata has no l_receiptdate/commitdate); "
        "the sole-guilty-supplier semantics are preserved exactly",
)
def tpch_q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    s = load_table(spark, sf_dir, "supplier")
    l1 = li.filter(F.col("l_returnflag") == "R").alias("l1")
    l2 = li.select("l_orderkey", "l_suppkey").alias("l2")
    l3 = (
        li.filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_suppkey")
        .alias("l3")
    )
    return (
        l1.join(
            l2,
            (F.col("l1.l_orderkey") == F.col("l2.l_orderkey"))
            & (F.col("l1.l_suppkey") != F.col("l2.l_suppkey")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l1.l_orderkey") == F.col("l3.l_orderkey"))
            & (F.col("l1.l_suppkey") != F.col("l3.l_suppkey")),
            "left_anti",
        )
        .join(o, F.col("l1.l_orderkey") == o.o_orderkey)
        .join(s, F.col("l1.l_suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).cast("bigint").alias("numwait"))
    )
