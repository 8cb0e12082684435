"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` runs the flagship trigram fuzzy-search pipeline (the
reference's marquee query, geo_manager.py:525-619) at sf0.001.
`queries()` / `oracle_sql()` expose every implemented operator from
SURVEY.md §2 plus the training-data pipeline extensions, each paired with
a DuckDB oracle over the same parquet tables.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from yat_geo_db_spark.queries.geo_queries import q_fuzzy_city
    from yat_geo_db_spark.session import apply_runtime_conf

    apply_runtime_conf(spark)
    return q_fuzzy_city(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Every callable first pins the runtime-settable session confs (UTC
    session timezone above all — the driver owns the SparkSession, and a
    non-UTC driver TZ would shift every date_format/window boundary out
    from under the oracle)."""
    from yat_geo_db_spark.queries import all_queries
    from yat_geo_db_spark.session import apply_runtime_conf

    def wrap(fn):
        def run(spark, sf_dir, _fn=fn):
            apply_runtime_conf(spark)
            return _fn(spark, sf_dir)

        return run

    return {name: wrap(fn) for name, (fn, _sql) in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each query (omitted → rows-only check)."""
    from yat_geo_db_spark.queries import all_queries

    return {
        name: sql for name, (_fn, sql) in all_queries().items() if sql is not None
    }
