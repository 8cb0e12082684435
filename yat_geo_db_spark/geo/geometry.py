"""Spherical-earth geometry as pure Column expressions (no UDFs).

Semantics match the reference (``geometry.py:7-75``): haversine distance in
miles with earth radius 3958.756, and mile→degree deltas used by the
radius-search ellipse predicate. Everything stays inside whole-stage codegen;
at 100 TB these are the cheap per-row expressions, never a Python boundary.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
import pyspark.sql.functions as F

#: reference geometry.py:4
EARTH_RADIUS_MILES = 3958.756


def haversine_miles(lat1: Column, lng1: Column, lat2: Column, lng2: Column) -> Column:
    """Great-circle distance in miles (reference geometry.py:7-34).

    Uses the same `2R·atan2(√a, √(1−a))` form so values agree with the
    reference (and the DuckDB oracle, which evaluates the identical formula).
    """
    lat1r, lng1r = F.radians(lat1), F.radians(lng1)
    lat2r, lng2r = F.radians(lat2), F.radians(lng2)
    a = (
        F.pow(F.sin((lat2r - lat1r) / 2), 2)
        + F.cos(lat1r) * F.cos(lat2r) * F.pow(F.sin((lng2r - lng1r) / 2), 2)
    )
    return 2 * F.lit(EARTH_RADIUS_MILES) * F.atan2(F.sqrt(a), F.sqrt(1 - a))


def haversine_sql(lat1: str, lng1: str, lat2: str, lng2: str) -> str:
    """The same formula as portable SQL text (Spark SQL == DuckDB), used to
    build oracle queries that must match :func:`haversine_miles` bit-for-bit
    up to libm rounding (outputs are rounded to 4 decimals like the
    reference, geo_manager.py:380-383)."""
    a = (
        f"(pow(sin((radians({lat2}) - radians({lat1})) / 2), 2) "
        f"+ cos(radians({lat1})) * cos(radians({lat2})) "
        f"* pow(sin((radians({lng2}) - radians({lng1})) / 2), 2))"
    )
    return f"(2 * {EARTH_RADIUS_MILES} * atan2(sqrt({a}), sqrt(1 - {a})))"


def latitude_delta_from_miles(miles: float) -> float:
    """miles → degrees latitude (reference geometry.py:37-53); a driver-side
    scalar because the radius is a query parameter, not data."""
    return (miles / EARTH_RADIUS_MILES) * 180.0 / math.pi


def longitude_delta_from_miles(lat: float, miles: float) -> float:
    """miles → degrees longitude at a reference latitude (geometry.py:56-75)."""
    r = EARTH_RADIUS_MILES * math.cos(lat * math.pi / 180.0)
    return (miles / r) * 180.0 / math.pi


def latitude_delta_col(miles: Column) -> Column:
    """Column form. Operation order mirrors the SQL fragment
    `(m / R) * 180.0 / pi()` exactly so both engines produce the same double."""
    return miles / F.lit(EARTH_RADIUS_MILES) * F.lit(180.0) / F.lit(math.pi)


def longitude_delta_col(lat: Column, miles: Column) -> Column:
    r = F.lit(EARTH_RADIUS_MILES) * F.cos(lat * F.lit(math.pi) / F.lit(180.0))
    return miles / r * F.lit(180.0) / F.lit(math.pi)


def latitude_delta_sql(miles: float) -> str:
    return f"({miles} / {EARTH_RADIUS_MILES} * 180.0 / pi())"


def longitude_delta_sql(lat_expr: str, miles: float) -> str:
    return (
        f"({miles} / ({EARTH_RADIUS_MILES} * cos({lat_expr} * pi() / 180.0))"
        f" * 180.0 / pi())"
    )
