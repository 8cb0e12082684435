"""Sketch aggregates (rel_approx_stats) have no SQL hash oracle — HLL++ and
KLL/GK results are algorithm-specific — so bound them against exact answers."""

from __future__ import annotations

import pyspark.sql.functions as F

from yat_geo_db_spark.queries.relational_queries import approx_stats
from yat_geo_db_spark.testdata import load_table

SF = "/root/testdata/sf0.01"


def test_approx_stats_within_tolerance(spark):
    got = {r["event_type"]: r for r in approx_stats(spark, SF).collect()}

    events = load_table(spark, SF, "events")
    exact = {
        r["event_type"]: r
        for r in events.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("users"),
            F.expr("percentile(value, array(0.5, 0.95))").alias("vp"),
        )
        .collect()
    }
    assert got.keys() == exact.keys() and len(got) > 0
    for et, e in exact.items():
        g = got[et]
        # HLL++ at default rsd=5%: allow 3x margin
        assert abs(g["approx_users"] - e["users"]) <= max(2, 0.15 * e["users"])
        # percentile_approx with accuracy=10000 on ~thousands of rows is
        # near-exact; exact interpolates between points, so allow a neighbor
        # gap of tolerance
        assert abs(g["p50"] - e["vp"][0]) < 1.0
        assert abs(g["p95"] - e["vp"][1]) < 1.0
