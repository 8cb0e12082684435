"""Bucketed co-located join: same-key bucketed tables must join with zero
exchanges (the write-time shuffle is amortized over every future join)."""

from __future__ import annotations

import pytest

from yat_geo_db_spark.relational.bucketing import bucketed_join, write_bucketed
from yat_geo_db_spark.testdata import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_has_no_exchange(spark, no_broadcast):
    orders = load_table(spark, SF, "orders")
    lineitem = load_table(spark, SF, "lineitem")
    write_bucketed(
        orders.withColumnRenamed("o_orderkey", "orderkey"), "t_orders_b", "orderkey"
    )
    write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "orderkey"),
        "t_lineitem_b",
        "orderkey",
    )
    try:
        joined = bucketed_join(spark, "t_orders_b", "t_lineitem_b", "orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # co-located: bucket i ⋈ bucket i
        # and the result is the ordinary join result
        expect = orders.join(
            lineitem, orders["o_orderkey"] == lineitem["l_orderkey"]
        ).count()
        assert joined.count() == expect
    finally:
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_lineitem_b")
