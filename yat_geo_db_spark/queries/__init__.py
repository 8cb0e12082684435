"""Named query registry — the driver contract surface.

Each entry maps a query name to a `(spark_fn, oracle_sql)` pair:
`spark_fn(spark, sf_dir) -> DataFrame` is the engine implementation;
`oracle_sql` is the equivalent DuckDB SQL over the same parquet tables
(None for non-SQL-expressible ops → driver runs a rows-only check).
"""

from __future__ import annotations

from yat_geo_db_spark.queries.geo_queries import QUERIES as GEO_QUERIES
from yat_geo_db_spark.queries.relational_queries import QUERIES as REL_QUERIES
from yat_geo_db_spark.queries.pipeline_queries import QUERIES as PIPE_QUERIES


def all_queries() -> dict:
    merged = {}
    for d in (GEO_QUERIES, REL_QUERIES, PIPE_QUERIES):
        overlap = merged.keys() & d.keys()
        assert not overlap, f"duplicate query names: {overlap}"
        merged.update(d)
    return merged
