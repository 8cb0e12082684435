"""Point lookups & conditional projections (reference ShapeManager,
geo_manager.py:61-165).

Each O(1) dict-get in the reference becomes a key-equality `filter` +
`select`. At scale these prune to single row-groups when `shapes` is written
sorted by `reference_code` (Parquet min/max pushdown — see geo.ingest); for
high-QPS point-get serving you'd broadcast the two-column id↔ref_code
projection (geo_manager.py:651-653) once and map-side join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
import pyspark.sql.functions as F


def shape_by_ref_code(shapes: DataFrame, reference_code: str) -> DataFrame:
    """P1 (geo_manager.py:84-88)."""
    return shapes.filter(F.col("reference_code") == F.lit(reference_code))


def shape_by_id(shapes: DataFrame, shape_id: int) -> DataFrame:
    """P2 (geo_manager.py:90-95)."""
    return shapes.filter(F.col("id") == F.lit(shape_id))


def id_ref_code_map(shapes: DataFrame) -> DataFrame:
    """P3/P4 projection (geo_manager.py:651-653); broadcast for serving."""
    return shapes.select("id", "reference_code")


def geo_type_of(shapes: DataFrame, keys: DataFrame) -> DataFrame:
    """P5 as a relation: join arbitrary keys to their geo_type."""
    return keys.join(F.broadcast(shapes.select("reference_code", "geo_type")),
                     on="reference_code", how="left")


def quote_location(shapes: DataFrame) -> DataFrame:
    """P6 `get_quote_location_by_id` (geo_manager.py:97-116): the CASE-WHEN
    reshape — MetroArea rows expose metro fields, everything else city/zip
    fields. Expressed over the whole table (the reference's per-id call is a
    filter on top)."""
    is_metro = F.col("geo_type") == "MetroArea"
    return shapes.select(
        "id",
        "reference_code",
        F.when(is_metro, F.lit(None).cast("string"))
        .otherwise(F.col("ref_data.zip_code")).alias("zip_code"),
        F.when(is_metro, F.lit(None).cast("string"))
        .otherwise(F.col("ref_data.city")).alias("city_name"),
        F.when(is_metro, F.lit(None).cast("string"))
        .otherwise(F.col("ref_data.state_prov")).alias("state_code"),
        F.when(is_metro, F.lit(None).cast("string"))
        .otherwise(F.col("ref_data.country")).alias("country_code"),
        F.when(is_metro, F.col("ref_data.city")).alias("namesake_city"),
        F.when(is_metro, F.col("ref_data.metro")).alias("metro_area_name"),
        F.when(is_metro, F.col("ref_data.metro_size")).alias("metro_area_size_rank"),
        F.when(is_metro, F.col("ref_data.state_prov")).alias("metro_area_primary_state_code"),
        F.when(is_metro, F.col("ref_data.country")).alias("metro_area_primary_country_code"),
    )


def shape_display(shapes: DataFrame, long_desc: bool = True,
                  user_friendly: bool = False) -> DataFrame:
    """P8 `get_shape_display_by_ref_code` (geo_manager.py:137-149): County &
    ZipCode route to long_display when user_friendly, MetroArea to
    short_display; otherwise the long_desc flag picks."""
    default = F.col("long_display") if long_desc else F.col("short_display")
    disp = default
    if user_friendly:
        disp = (
            F.when(F.col("geo_type").isin("County", "ZipCode"), F.col("long_display"))
            .when(F.col("geo_type") == "MetroArea", F.col("short_display"))
            .otherwise(default)
        )
    return shapes.select("reference_code", disp.alias("display"))


def shape_local_time(shapes: DataFrame) -> DataFrame:
    """P10 `get_shape_time_by_ref_code` (geo_manager.py:151-158): wall-clock
    time in the shape's IANA timezone; null tz → naive now() (we surface UTC).
    Non-deterministic by nature → rows-only correctness check."""
    return shapes.select(
        "reference_code",
        "primary_timezone",
        F.from_utc_timestamp(
            F.current_timestamp(),
            F.coalesce(F.col("primary_timezone"), F.lit("UTC")),
        ).alias("local_time"),
    )


def shape_local_time_asof(shapes: DataFrame, as_of_utc: str) -> DataFrame:
    """P10 twin with a PINNED UTC instant: the same tz ladder as
    shape_local_time (get_shape_time_by_ref_code, geo_manager.py:151-158)
    evaluated at a fixed time instead of now() — deterministic, so the
    IANA-tz conversion itself is value-checked against DuckDB's ICU
    `timezone()`; the wall-clock variant stays rows-only by nature."""
    return shapes.select(
        "reference_code",
        "primary_timezone",
        F.from_utc_timestamp(
            # session tz is pinned UTC (apply_runtime_conf), so this
            # literal parses as the intended UTC instant
            F.to_timestamp(F.lit(as_of_utc)),
            F.coalesce(F.col("primary_timezone"), F.lit("UTC")),
        ).alias("local_time"),
    )


def num_shapes(shapes: DataFrame) -> int:
    """S6 (geo_manager.py:667-669)."""
    return shapes.count()
