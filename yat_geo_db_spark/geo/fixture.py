"""Deterministic geo `shapes` fixture, defined as PORTABLE SQL over the
driver's `customer` table.

Why SQL text and not a DataFrame builder: the driver's correctness gate runs
every query twice — our Spark DataFrame vs a DuckDB oracle — over the same
parquet. By deriving the shapes table from `customer` with a single SQL text
that is valid (and numerically identical) in BOTH engines, every geo operator
becomes hash-checkable end to end. Only portable constructs are used:
CASE / % / floor / CAST / lower / upper / replace / || / IN.

Schema follows the reference record (reference README.md:81-106, consumed
fields per SURVEY.md §1.2): reference_code PK, id, value, clean_value,
lat/lng as double, flattened bbox, area, geo_type enum, flattened ref_data,
population, aggregate/zip flags, displays, primary_timezone.

Scale note: at 100 TB `shapes` would be a real Parquet dataset (see
geo.ingest); this fixture exists so correctness checks have a deterministic
input at every scale factor. All operators take any DataFrame with this
schema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

# 16 city names sharing many trigrams (nash/ville/ton/...) so fuzzy search is
# non-trivial; 8 states. Selection by modular index keeps both engines exact.
CITIES = (
    "nashville", "nashua", "ashland", "asheville",
    "knoxville", "greenville", "springfield", "franklin",
    "madison", "clinton", "salem", "fairview",
    "bristol", "clayton", "dayton", "georgetown",
)
STATES = ("tn", "ca", "tx", "ny", "il", "ga", "wa", "ks")
TZS = ("America/New_York", "America/Chicago", "America/Denver", "America/Los_Angeles")


def _case_from(expr: str, values, quote=True) -> str:
    arms = " ".join(
        f"WHEN {i} THEN {repr(v) if quote else v}" for i, v in enumerate(values)
    )
    return f"CASE {expr} {arms} END"


def _shapes_cte_body() -> str:
    city = _case_from("ci", CITIES)
    st = _case_from("si", STATES)
    tz = _case_from("si % 4", TZS)
    # value: the display string; clean_value strips the only non-alnum char (',')
    value = (
        "CASE gm "
        f"WHEN 0 THEN {city} || ', ' || upper({st}) "
        "WHEN 1 THEN CAST(zip AS VARCHAR(30)) || ', US' "
        f"WHEN 2 THEN {city} || ' metro, ' || upper({st}) "
        f"ELSE {city} || ' county, ' || upper({st}) END"
    )
    return f"""
  SELECT
    id,
    'us__' || {st} || '__' || {city} || '_' || CAST(id AS VARCHAR(30)) AS reference_code,
    {value} AS value,
    lower(replace({value}, ',', '')) AS clean_value,
    CAST(28.0 + ci * 1.1 + ((id * 13) % 100) * 0.003 AS DOUBLE) AS latitude,
    CAST(-122.0 + si * 6.5 + ((id * 17) % 100) * 0.003 AS DOUBLE) AS longitude,
    CAST(CASE WHEN gm IN (2, 3) THEN 5.0 + (id % 200) * 3.7 ELSE 0.0 END AS DOUBLE) AS area,
    CASE gm WHEN 0 THEN 'City' WHEN 1 THEN 'ZipCode' WHEN 2 THEN 'MetroArea' ELSE 'County' END AS geo_type,
    CASE WHEN id % 7 = 0 THEN 0 ELSE 1000 + (id * 9176) % 2000000 END AS population,
    gm IN (2, 3) AS is_aggregate,
    gm = 1 AS is_zip_code,
    gm = 1 AND id % 5 = 0 AS is_three_digit_zip_code,
    {value} || ' (' || CASE gm WHEN 0 THEN 'City' WHEN 1 THEN 'ZipCode' WHEN 2 THEN 'MetroArea' ELSE 'County' END || ')' AS long_display,
    CASE WHEN gm = 1 THEN CAST(zip AS VARCHAR(30)) ELSE {city} END AS short_display,
    CASE WHEN id % 6 = 0 THEN NULL ELSE {tz} END AS primary_timezone,
    {city} AS rd_city,
    CASE id % 11 WHEN 0 THEN 'CA' WHEN 1 THEN 'MX' ELSE 'US' END AS rd_country,
    CASE WHEN gm = 1 THEN CAST(zip AS VARCHAR(30)) ELSE NULL END AS rd_zip_code,
    upper({st}) AS rd_state_prov,
    CASE WHEN gm = 2 THEN {city} || ' metro area' ELSE NULL END AS rd_metro,
    CASE WHEN gm = 2 THEN id % 50 ELSE NULL END AS rd_metro_size,
    CAST(CASE WHEN gm IN (2, 3) THEN 28.0 + ci * 1.1 + ((id * 13) % 100) * 0.003 - (0.15 + (id % 10) * 0.04) ELSE NULL END AS DOUBLE) AS bb_ll_lat,
    CAST(CASE WHEN gm IN (2, 3) THEN 28.0 + ci * 1.1 + ((id * 13) % 100) * 0.003 + (0.15 + (id % 10) * 0.04) ELSE NULL END AS DOUBLE) AS bb_ur_lat,
    CAST(CASE WHEN gm IN (2, 3) THEN -122.0 + si * 6.5 + ((id * 17) % 100) * 0.003 - (0.15 + (id % 10) * 0.04) * 1.3 ELSE NULL END AS DOUBLE) AS bb_ll_lng,
    CAST(CASE WHEN gm IN (2, 3) THEN -122.0 + si * 6.5 + ((id * 17) % 100) * 0.003 + (0.15 + (id % 10) * 0.04) * 1.3 ELSE NULL END AS DOUBLE) AS bb_ur_lng
  FROM (
    SELECT
      c_custkey AS id,
      c_custkey % 4 AS gm,
      c_custkey % 16 AS ci,
      CAST(floor(c_custkey / 16.0) AS BIGINT) % 8 AS si,
      10000 + (c_custkey * 7919) % 89999 AS zip
    FROM customer
  ) b
"""


#: `WITH`-clause entry, portable between Spark SQL and DuckDB:
#: prepend "WITH " + SHAPES_CTE + " SELECT ..." in either engine.
SHAPES_CTE = "shapes AS (" + _shapes_cte_body() + ")"


def shapes_flat_df(spark: SparkSession) -> DataFrame:
    """The shapes table with flat (oracle-friendly) column names.

    Requires the `customer` temp view (yat_geo_db_spark.testdata.register_views).
    """
    return spark.sql(f"WITH {SHAPES_CTE} SELECT * FROM shapes")


def shapes_df(spark: SparkSession) -> DataFrame:
    """The shapes table in the engine's canonical nested schema: `ref_data`
    and `bbox` as structs, mirroring the reference record shape so dotted-path
    filters (`ref_data.state_prov`) resolve natively (utils.py:5-21 →
    `F.col('ref_data.state_prov')`)."""
    flat = shapes_flat_df(spark)
    return flat.select(
        "id",
        "reference_code",
        "value",
        "clean_value",
        "latitude",
        "longitude",
        "area",
        "geo_type",
        "population",
        "is_aggregate",
        "is_zip_code",
        "is_three_digit_zip_code",
        "long_display",
        "short_display",
        "primary_timezone",
        F.struct(
            F.col("rd_city").alias("city"),
            F.col("rd_country").alias("country"),
            F.col("rd_zip_code").alias("zip_code"),
            F.col("rd_state_prov").alias("state_prov"),
            F.col("rd_metro").alias("metro"),
            F.col("rd_metro_size").alias("metro_size"),
        ).alias("ref_data"),
        F.struct(
            F.col("bb_ll_lat").alias("ll_latitude"),
            F.col("bb_ur_lat").alias("ur_latitude"),
            F.col("bb_ll_lng").alias("ll_longitude"),
            F.col("bb_ur_lng").alias("ur_longitude"),
        ).alias("bbox"),
    )
