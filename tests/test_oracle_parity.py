"""Mimics the driver's correctness gate: run every registry query through
Spark AND its DuckDB oracle over the same parquet, compare row count +
column names + order-insensitive canonicalized values.

Run a single query: pytest tests/test_oracle_parity.py -k geo_fuzzy_city
"""

from __future__ import annotations

import math
import os

import duckdb
import pytest

from yat_geo_db_spark.queries import all_queries
from yat_geo_db_spark.testdata import TABLES

SF_DIR = os.environ.get("PARITY_SF_DIR", "/root/testdata/sf0.001")

REGISTRY = all_queries()
# PARITY_FIRST_N=<N> restricts the run to the FIRST N names in registry
# order — all_queries() sorts stalest-first (driver-evidence age, with
# fingerprint-invalidated rows in front), so this is the cohort selector
# for the budgeted sf0.1 staleness sweeps (VERDICT r12 task 4).
# PARITY_SKIP_N=<K> drops the first K names before applying FIRST_N —
# the complement selector, so a round that already swept the K stalest
# can sweep the remainder without re-running the freshest cohort.
_FIRST_N = int(os.environ.get("PARITY_FIRST_N", "0"))
_SKIP_N = int(os.environ.get("PARITY_SKIP_N", "0"))
_NAMES = list(REGISTRY)[_SKIP_N:]
_PICK = set(_NAMES[:_FIRST_N] if _FIRST_N else _NAMES)
ORACLE_CASES = sorted(
    n for n, (_f, sql) in REGISTRY.items() if sql is not None and n in _PICK
)
ROWS_ONLY_CASES = sorted(
    n for n, (_f, sql) in REGISTRY.items() if sql is None and n in _PICK
)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


def canon_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # driver-style tolerant float canon: queries pre-round, so repr of
        # the rounded double is stable across engines
        return repr(round(v, 9))
    if isinstance(v, bool):
        return bool(v)
    if hasattr(v, "item"):  # numpy scalar
        return canon_cell(v.item())
    return v


def canon(pdf):
    cols = sorted(pdf.columns)
    rows = [
        tuple(canon_cell(v) for v in row)
        for row in pdf[cols].itertuples(index=False, name=None)
    ]
    return cols, sorted(rows, key=repr)


@pytest.mark.parametrize("name", ORACLE_CASES)
def test_oracle_parity(name, spark, duck):
    fn, sql = REGISTRY[name]
    got = fn(spark, SF_DIR).toPandas()
    want = duck.sql(sql).df()
    got_cols, got_rows = canon(got)
    want_cols, want_rows = canon(want)
    assert got_cols == want_cols, f"{name}: columns {got_cols} != {want_cols}"
    assert len(got_rows) == len(want_rows), (
        f"{name}: {len(got_rows)} rows vs oracle {len(want_rows)}"
    )
    mismatches = [
        (a, b) for a, b in zip(got_rows, want_rows) if a != b
    ][:5]
    assert not mismatches, f"{name}: first mismatches {mismatches}"


@pytest.mark.parametrize("name", ROWS_ONLY_CASES)
def test_rows_only(name, spark):
    fn, _ = REGISTRY[name]
    df = fn(spark, SF_DIR)
    # the driver's rows-only canonicalizer pandas-sorts EVERY column, and
    # dies on array/map/struct cells (r3: pipe_emb_pca) — registry rows
    # must emit scalar digests instead (library APIs keep rich types)
    import pyspark.sql.types as T

    nested = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
    ]
    assert not nested, (
        f"{name}: non-scalar output columns {nested} would crash the "
        "driver canonicalizer — emit a scalar digest"
    )
    assert df.count() >= 0
    assert len(df.columns) > 0
