"""Loaders for the driver-generated synthetic tables (TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events
documents embeddings — one parquet each under ``/root/testdata/sf*/``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: The fixture tables are each ONE parquet file with ONE row group, so a
#: Spark scan yields exactly one non-empty partition no matter how the file
#: is split — and everything pipelined onto the scan (partial aggregation,
#: interpreted higher-order functions) runs on one core of a 32-core box.
#: jstack-verified: the wandering 40-120 s bench stalls were one RUNNABLE
#: executor thread grinding a whole table while 31 threads idled. On a real
#: cluster a 100 TB table has ~10^5 row groups and Spark parallelizes the
#: scan natively; this round-robin repartition reintroduces locally the
#: parallelism the fixture layout takes away. Costs one small exchange
#: (these tables are ≤ tens of MB); disable with SPARK_GRAFT_SCAN_REPARTITION=0.
_SCAN_COMPENSATE = os.environ.get("SPARK_GRAFT_SCAN_REPARTITION", "1") != "0"
#: small dimensions where a broadcast-sized single partition is the point
_NO_COMPENSATE = {"region", "nation"}

#: Per-(session, sf_dir, table) DataFrame cache, `.cache()`-persisted.
#: The driver's correctness pass runs ~95 queries against the SAME ~10 tiny
#: fixture tables in one SparkSession; without this each query re-scans and
#: re-repartitions its inputs, and the per-query fixed cost is what decides
#: whether the whole registry fits the driver's time budget. At 100 TB this
#: cache is irrelevant by construction (each table is read once per job and
#:	would not fit memory); it is a fixture-serving optimization only.
#: Disable with SPARK_GRAFT_TABLE_CACHE=0 (plan-shape tests that need to see
#: raw scans bypass load_table entirely and are unaffected).
_TABLE_CACHE: dict = {}
_CACHE_ENABLED = os.environ.get("SPARK_GRAFT_TABLE_CACHE", "1") != "0"


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    key = (spark, os.path.abspath(sf_dir), name)
    if _CACHE_ENABLED:
        cached = _TABLE_CACHE.get(key)
        if cached is not None:
            return cached
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        # events.ts has shipped as parquet TIMESTAMP(NANOS) in some driver
        # generations, which Spark cannot read natively: read with nanos-as-
        # long and truncate to micros (what DuckDB's timestamp cast does,
        # keeping oracle parity). Other generations ship TIMESTAMP(MICROS),
        # where the flag is a no-op and ts arrives as a timestamp already —
        # only convert when the read actually produced a long.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        try:
            df = spark.read.parquet(path)
        finally:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            # micros generations read as TIMESTAMP_NTZ, which watermarks
            # reject; the session tz is pinned to UTC so this cast is the
            # identity wall-clock mapping (same instants DuckDB sees)
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    else:
        df = spark.read.parquet(path)
    if _SCAN_COMPENSATE and name not in _NO_COMPENSATE:
        df = df.repartition(spark.sparkContext.defaultParallelism)
    if _CACHE_ENABLED:
        df = df.cache()
        _TABLE_CACHE[key] = df
    return df


def register_views(spark: SparkSession, sf_dir: str, tables=TABLES) -> None:
    """Register each table as a temp view so SQL-defined fixtures (the geo
    shapes CTE) and ad-hoc SQL can address them by name."""
    for name in tables:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
