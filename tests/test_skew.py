"""Salted join must be row-identical to the plain join."""

from __future__ import annotations

import pyspark.sql.functions as F

from yat_geo_db_spark.relational.skew import salted_join
from yat_geo_db_spark.testdata import load_table

SF = "/root/testdata/sf0.001"


def test_salted_join_equals_plain_join(spark):
    orders = load_table(spark, SF, "orders")
    customer = load_table(spark, SF, "customer").withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    plain = orders.join(customer, "o_custkey").select(
        "o_orderkey", "o_custkey", "c_name"
    )
    salted = salted_join(
        orders, customer, on="o_custkey", salt_src=F.col("o_orderkey"), salts=8
    ).select("o_orderkey", "o_custkey", "c_name")
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))
    assert plain.count() > 0
