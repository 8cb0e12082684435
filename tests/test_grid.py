"""Grid-cell spatial layout (geo.grid): gridded radius search must be
row-identical to the full-scan operator, with PartitionFilters proving the
pruning actually happens at the source.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from yat_geo_db_spark.geo import grid
from yat_geo_db_spark.geo.radius import radius_search_lat_lng


@pytest.fixture(scope="module")
def gridded(spark, shapes, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("grid") / "shapes_gridded")
    grid.write_gridded_shapes(shapes, path)
    return grid.read_gridded_shapes(spark, path)


# origins: fixture city band (see geo.fixture — lats ~30-48, lngs ~-120..-70)
CASES = [
    (36.16, -86.78, 50.0),
    (36.16, -86.78, 250.0),   # multi-cell cover
    (40.0, -100.0, 10.0),     # likely-empty area
    (47.9, -70.1, 400.0),     # corner of the populated band
]


@pytest.mark.parametrize("lat,lng,radius", CASES)
def test_gridded_matches_full_scan(spark, shapes, gridded, lat, lng, radius):
    want = sorted(
        r["id"] for r in radius_search_lat_lng(shapes, lat, lng, radius).collect()
    )
    got = sorted(
        r["id"]
        for r in grid.radius_search_gridded(gridded, lat, lng, radius).collect()
    )
    assert got == want


def test_partition_filters_in_plan(gridded):
    df = grid.radius_search_gridded(gridded, 36.16, -86.78, 50.0)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "cell IN" in plan or "cell#" in plan.split("PartitionFilters")[1][:300]


def test_cover_cells_contains_origin_and_grows(spark):
    lat, lng = 36.16, -86.78
    origin_cell = (
        spark.range(1)
        .select(grid.grid_cell_col(F.lit(lat), F.lit(lng)).alias("c"))
        .collect()[0]["c"]
    )
    small = set(grid.cover_cells(lat, lng, 10.0))
    big = set(grid.cover_cells(lat, lng, 300.0))
    assert origin_cell in small
    assert small <= big


def test_aggregates_never_pruned(spark, shapes, gridded):
    # an origin inside some aggregate's bbox but with a tiny radius: the
    # aggregate must still be found even though its centroid cell may be
    # outside the cover set
    agg = shapes.filter(F.col("is_aggregate")).select(
        "id", "bbox.ll_latitude", "bbox.ur_latitude",
        "bbox.ll_longitude", "bbox.ur_longitude",
    ).first()
    if agg is None:
        pytest.skip("fixture has no aggregates")
    o_lat = (agg["ll_latitude"] + agg["ur_latitude"]) / 2
    o_lng = (agg["ll_longitude"] + agg["ur_longitude"]) / 2
    got = {
        r["id"]
        for r in grid.radius_search_gridded(gridded, o_lat, o_lng, 1.0).collect()
    }
    assert agg["id"] in got


def test_radius_join_gridded_row_identical_to_broadcast_join(spark, tmp_path):
    """The equi-join-on-cells batch form returns exactly the broadcast
    BNLJ batch form's rows, and no SortMergeJoin of two big sides appears
    without a cell equi-key (the plan carries the cell join)."""
    import pyspark.sql.functions as F
    from yat_geo_db_spark.geo.fixture import shapes_df
    from yat_geo_db_spark.geo.grid import (
        radius_join_gridded, read_gridded_shapes, write_gridded_shapes,
    )
    from yat_geo_db_spark.geo.radius import radius_join
    from yat_geo_db_spark.testdata import register_views

    register_views(spark, "/root/testdata/sf0.001", tables=("customer",))
    shapes = shapes_df(spark)
    path = str(tmp_path / "gridded")
    write_gridded_shapes(shapes, path)
    gridded = read_gridded_shapes(spark, path)

    origins = (
        shapes.filter((F.col("id") < 12) & ~F.col("is_aggregate"))
        .select(F.col("id").alias("origin_id"), "latitude", "longitude")
    )
    want = {
        (r["origin_id"], r["id"], r["distance"])
        for r in radius_join(shapes, origins, 120.0).collect()
    }
    got = {
        (r["origin_id"], r["id"], r["distance"])
        for r in radius_join_gridded(gridded, origins, 120.0).collect()
    }
    assert got == want and want  # identical and non-vacuous


def test_cover_cells_col_matches_driver_side_twin(spark):
    """The Column cover-cells math must equal the driver-side cover_cells
    for randomized origins/radii (one batched comparison job), including
    pole-clamped latitudes."""
    import random
    import pyspark.sql.functions as F
    from yat_geo_db_spark.geo.grid import cover_cells, cover_cells_col

    r = random.Random(5)
    cases = [
        (round(r.uniform(-88.0, 88.0), 3), round(r.uniform(-179.0, 179.0), 3),
         round(r.uniform(1.0, 400.0), 1))
        for _ in range(60)
    ] + [(89.5, 10.0, 100.0), (-89.9, -170.0, 50.0)]  # polar caps
    df = spark.createDataFrame(
        [(i, la, ln, rad) for i, (la, ln, rad) in enumerate(cases)],
        "i int, lat double, lng double, radius double",
    )
    # one radius per row isn't expressible with the scalar-radius Column
    # helper, so group cases by radius and run one select per radius value
    by_radius = {}
    for i, (la, ln, rad) in enumerate(cases):
        by_radius.setdefault(rad, []).append((i, la, ln))
    for rad, rows_ in by_radius.items():
        sub = df.filter(F.col("radius") == rad)
        got = {
            row["i"]: sorted(row["cells"])
            for row in sub.select(
                "i",
                cover_cells_col(F.col("lat"), F.col("lng"), rad).alias("cells"),
            ).collect()
        }
        for i, la, ln in rows_:
            assert got[i] == cover_cells(la, ln, rad), (la, ln, rad)


def test_density_hotspots_neighborhood_mass(spark):
    """A planted dense cluster must rank first; its neighborhood mass
    must include adjacent-cell points; aggregates and null coordinates
    are excluded."""
    import pyspark.sql.functions as F
    from yat_geo_db_spark.geo.grid import density_hotspots

    rows = []
    # 10 points in cell (10, 20); 3 in the adjacent cell (11, 20)
    for i in range(10):
        rows.append((i, 20.5, 10.5, False))
    for i in range(10, 13):
        rows.append((i, 20.5, 11.5, False))
    # far singleton + an aggregate + a null-coord row (both excluded)
    rows.append((50, -40.5, -100.5, False))
    rows.append((51, 20.5, 10.5, True))
    rows.append((52, None, 10.5, False))
    df = spark.createDataFrame(
        rows, "id long, latitude double, longitude double, is_aggregate boolean"
    )
    out = density_hotspots(df, cell_deg=1.0, top_k=5).collect()
    top = out[0]
    assert (top["cx"], top["cy"]) == (10, 20)
    assert top["n_cell"] == 10 and top["n_neighborhood"] == 13
    cells = {(r["cx"], r["cy"]): r for r in out}
    assert cells[(11, 20)]["n_neighborhood"] == 13
    assert cells[(-101, -41)]["n_neighborhood"] == 1


def test_geohash_matches_textbook_bisection(spark):
    """The codegen'd bit-interleave geohash must equal the classic
    bisection algorithm character-for-character on random points and
    the canonical landmark cases, at several precisions."""
    import random

    import pyspark.sql.functions as F
    from yat_geo_db_spark.geo.grid import GEOHASH_ALPHABET, geohash_col

    def ref(lat, lon, precision):
        lat_r, lon_r = [-90.0, 90.0], [-180.0, 180.0]
        bits, ch, out, even = 0, 0, "", True
        while len(out) < precision:
            rng = lon_r if even else lat_r
            v = lon if even else lat
            mid = sum(rng) / 2
            if v >= mid:
                ch = ch * 2 + 1
                rng[0] = mid
            else:
                ch = ch * 2
                rng[1] = mid
            even = not even
            bits += 1
            if bits == 5:
                out += GEOHASH_ALPHABET[ch]
                bits, ch = 0, 0
        return out

    rng = random.Random(42)
    pts = [(57.64911, 10.40744), (40.689247, -74.044502),
           (-33.8568, 151.2153), (0.0, 0.0), (-89.9, -179.9)]
    pts += [
        (rng.uniform(-90, 90), rng.uniform(-180, 180)) for _ in range(40)
    ]
    # adversarial near-boundary coordinates (review regression: the bare
    # multiply-quantization rounds these across a cell edge)
    pts += [(29.707031249999993, 0.0), (3.5156249999999996, 0.0),
            (-4.108886718750001, 0.0)]
    # randomized boundary-adjacent points: a hair below exact cell edges
    import math
    for _ in range(30):
        q = rng.randrange(1, 1 << 10)
        lat_edge = -90.0 + q * (180.0 / (1 << 10))
        pts.append((math.nextafter(lat_edge, -math.inf),
                    rng.uniform(-180, 180)))
    df = spark.createDataFrame(pts, "lat double, lng double")
    for p in (1, 4, 6):
        got = [
            r["gh"]
            for r in df.select(
                geohash_col(F.col("lat"), F.col("lng"), p).alias("gh")
            ).collect()
        ]
        want = [ref(lat, lon, p) for lat, lon in pts]
        assert got == want, p
