"""Bucketed (co-located) joins — the storage-level shuffle eliminator.

At 100 TB the same fact-to-fact join key (orders ⋈ lineitem on orderkey)
recurs across every pipeline run; hash-bucketing BOTH tables on that key at
write time makes every subsequent join a zero-exchange sort-merge: each
task reads bucket i of both sides, already co-partitioned (and pre-sorted
with sortBy, so even the sort is free). One write-time shuffle amortized
over every future join — the same reasoning as the postings table's
bucket-by-ngram layout (geo.ingest.materialize_postings).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame, table: str, key: str, buckets: int = 8
) -> None:
    """Persist as a bucketed+sorted managed table (parquet). Joins between
    tables bucketed on the same key with the same bucket count skip the
    exchange entirely."""
    (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(buckets, key)
        .sortBy(key)
        .saveAsTable(table)
    )


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key. The physical plan
    must show SortMergeJoin with NO Exchange on either side (asserted in
    tests/test_bucketing.py)."""
    return spark.table(left_table).join(spark.table(right_table), key)
