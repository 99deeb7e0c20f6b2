"""Bucketed co-located joins: the 100 TB fact-fact join strategy.

At scale, lineitem ⋈ orders on the order key is the dominant shuffle; if
both tables are bucketed by that key at write time, Spark plans a
shuffle-free sort-merge join (exchange elided on both sides). This test
proves the engine's write/read path produces that plan.
"""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def bucketed(spark, sf_dir):
    # managed tables land in the session's default warehouse dir; DROP TABLE
    # removes their data afterwards (warehouse.dir is a static conf)
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    (li.write.mode("overwrite").bucketBy(8, "l_orderkey")
       .sortBy("l_orderkey").format("parquet").saveAsTable("li_b"))
    (orders.write.mode("overwrite").bucketBy(8, "o_orderkey")
       .sortBy("o_orderkey").format("parquet").saveAsTable("ord_b"))
    yield spark.table("li_b"), spark.table("ord_b")
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")


def test_bucketed_join_elides_shuffle(spark, bucketed):
    li, orders = bucketed
    # disable broadcast so the join strategy question is real
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = li.join(orders, li.l_orderkey == orders.o_orderkey).groupBy(
            "o_orderpriority"
        ).agg(F.count("*").alias("n"))
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # the join itself must not introduce an exchange on either side
        join_part = plan[: plan.find("SortMergeJoin") + 1] if "SortMergeJoin" in plan else plan
        assert "SortMergeJoin" in plan
        before_join = plan.split("SortMergeJoin")[1] if "SortMergeJoin" in plan else ""
        assert "Exchange hashpartitioning(l_orderkey" not in plan
        assert "Exchange hashpartitioning(o_orderkey" not in plan
        # and the result is still correct
        rows = {r["o_orderpriority"]: r["n"] for r in joined.collect()}
        li_cnt = li.join(orders, li.l_orderkey == orders.o_orderkey).count()
        assert sum(rows.values()) == li_cnt
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_unbucketed_join_does_shuffle(spark, sf_dir):
    """Control: the same join over plain parquet shuffles both sides."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = li.join(orders, li.l_orderkey == orders.o_orderkey)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
