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


def test_skew_report_shares_and_ranks(spark):
    """skew_report must surface the hot key first with its fair-share
    multiple, and cum_share must reach 1.0 when top_k covers all keys."""
    import pyspark.sql.functions as F

    from yat_geo_db_spark.relational.skew import skew_report

    rows = [("hot",)] * 60 + [("warm",)] * 30 + [("cold",)] * 10
    df = spark.createDataFrame(rows, "k string")
    rep = skew_report(df, ["k"], top_k=10).collect()
    assert [r["k"] for r in rep] == ["hot", "warm", "cold"]
    hot = rep[0]
    assert hot["n_rows"] == 60 and hot["share"] == 0.6
    # 3 keys, 100 rows -> uniform is 33.33; hot is 1.8x uniform
    assert abs(hot["x_uniform"] - 1.8) < 1e-9
    assert rep[-1]["cum_share"] == 1.0
    assert [r["rank"] for r in rep] == [1, 2, 3]

    # top_k truncates deterministically (count desc, key asc tiebreak)
    tied = spark.createDataFrame(
        [("a",), ("b",), ("c",), ("c",)], "k string"
    )
    top2 = skew_report(tied, ["k"], top_k=2).collect()
    assert [r["k"] for r in top2] == ["c", "a"]


def test_skewed_count_distinct_equals_single_phase(spark):
    """Two-phase distinct counting must be row-identical to the
    single-phase count_distinct, including NULL exclusion and a
    pathological hot key."""
    import pyspark.sql.functions as F

    from yat_geo_db_spark.relational.skew import skewed_count_distinct

    rows = (
        [("hot", i % 7) for i in range(500)]      # hot key, 7 distinct
        + [("cold", i) for i in range(3)]
        + [("nulls", None), ("nulls", 1), ("nulls", 1)]
    )
    df = spark.createDataFrame(rows, "k string, v int")
    got = {
        r["k"]: r["n_distinct"]
        for r in skewed_count_distinct(df, ["k"], "v").collect()
    }
    want = {
        r["k"]: r["n"]
        for r in df.groupBy("k").agg(
            F.count_distinct("v").alias("n")
        ).collect()
    }
    assert got == want == {"hot": 7, "cold": 3, "nulls": 1}


def test_bloom_pruned_join_identity_and_pruning(spark):
    """Bloom pruning must be row-identical to the plain inner join
    (no false negatives; join removes false positives), and the
    pre-join filter must actually drop a meaningful share of the
    large side before the shuffle."""
    from yat_geo_db_spark.relational.skew import (
        bloom_build,
        bloom_might_contain,
        bloom_pruned_join,
    )

    lineitem = load_table(spark, SF, "lineitem")
    orders = load_table(spark, SF, "orders").where(
        F.col("o_orderpriority") == "1-URGENT"
    )
    keys = orders.select(F.col("o_orderkey").alias("l_orderkey"))
    plain = lineitem.join(keys, "l_orderkey").select(
        "l_orderkey", "l_linenumber"
    )
    bloomed = bloom_pruned_join(lineitem, keys, "l_orderkey").select(
        "l_orderkey", "l_linenumber"
    )
    assert sorted(map(tuple, bloomed.collect())) == sorted(
        map(tuple, plain.collect())
    )
    # pruning is real: the filtered scan is a strict subset of the table
    words = bloom_build(keys, "l_orderkey")
    pruned_n = lineitem.where(
        bloom_might_contain(F.col("l_orderkey"), words, 1 << 16, 4)
    ).count()
    total_n = lineitem.count()
    match_n = plain.count()
    assert match_n <= pruned_n < total_n


def test_bloom_false_positive_rate_bounded(spark):
    """Probing keys DISJOINT from the built set must pass at well under
    the theoretical fp ceiling (k=4, n=1500, m=2^16 → ~0.2%)."""
    from yat_geo_db_spark.relational.skew import (
        bloom_build,
        bloom_might_contain,
    )

    build = spark.range(0, 1500).withColumnRenamed("id", "k")
    words = bloom_build(build, "k", m_bits=1 << 16, k_hashes=4)
    probe = spark.range(1_000_000, 1_020_000).withColumnRenamed("id", "k")
    fp = probe.where(
        bloom_might_contain(F.col("k"), words, 1 << 16, 4)
    ).count()
    assert fp / 20_000 < 0.01


def test_bloom_pruned_join_rejects_outer(spark):
    import pytest
    from yat_geo_db_spark.relational.skew import bloom_pruned_join

    lineitem = load_table(spark, SF, "lineitem")
    keys = load_table(spark, SF, "orders").select(
        F.col("o_orderkey").alias("l_orderkey")
    )
    with pytest.raises(ValueError):
        bloom_pruned_join(lineitem, keys, "l_orderkey", how="left")


def test_join_explosion_report_exact_products(spark):
    """The per-key out_rows must equal the true join output per key,
    and the report's total share must account for the whole join."""
    left = spark.createDataFrame(
        [("hot", i) for i in range(10)] + [("cold", 0), ("only_l", 1)],
        "k string, x long",
    )
    right = spark.createDataFrame(
        [("hot", i) for i in range(20)] + [("cold", 0), ("only_r", 2)],
        "k string, y long",
    )
    from yat_geo_db_spark.relational.skew import join_explosion_report

    rep = {r["k"]: r for r in join_explosion_report(left, right, "k").collect()}
    assert rep["hot"]["out_rows"] == 200 and rep["cold"]["out_rows"] == 1
    assert "only_l" not in rep and "only_r" not in rep
    true_join = left.join(right, "k").count()
    assert sum(r["out_rows"] for r in rep.values()) == true_join
    assert abs(sum(r["share_of_join"] for r in rep.values()) - 1.0) < 1e-6
