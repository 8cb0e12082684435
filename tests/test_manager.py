"""GeoManager facade: the reference's call sites must work unchanged
(method names, parameters, driver-side return shapes — reference README.md
usage examples re-created on the synthetic fixture)."""

from __future__ import annotations

import pytest

from yat_geo_db_spark.geo.fixture import shapes_df
from yat_geo_db_spark.manager import GeoManager
from yat_geo_db_spark.testdata import register_views


@pytest.fixture(scope="module")
def gm(spark):
    register_views(spark, "/root/testdata/sf0.001")
    return GeoManager(spark, shapes=shapes_df(spark))


def test_point_lookup_family(gm):
    rec = gm.get_shape_by_ref_code("us__tn__nashville_0")
    assert rec is not None and rec["geo_type"] == "City"
    sid = rec["id"]
    assert gm.get_shape_by_id(sid)["reference_code"] == "us__tn__nashville_0"
    assert gm.get_shape_ref_code(sid) == "us__tn__nashville_0"
    assert gm.get_shape_id_by_ref_code("us__tn__nashville_0") == sid
    assert gm.get_shape_geo_type(sid) == "City"
    assert gm.get_shape_geo_type_by_ref_code("us__tn__nashville_0") == "City"
    assert gm.get_shape_by_ref_code("zz__nope") is None
    assert gm.get_shape_ref_code(10**9) is None


def test_quote_location_and_display(gm):
    q = gm.get_quote_location_by_reference_code("us__tn__nashville_0")
    assert q["city_name"] is not None and q["metro_area_name"] is None
    disp = gm.get_shape_display_by_ref_code("us__tn__nashville_0")
    assert isinstance(disp, str) and disp
    t = gm.get_shape_time_by_ref_code("us__tn__nashville_0")
    assert t is not None


def test_radius_family(gm):
    ids = gm.radius_search("us__tn__nashville_0", 50.0)
    assert isinstance(ids, list) and len(ids) > 0 and all(
        isinstance(i, int) for i in ids
    )
    full = gm.radius_search("us__tn__nashville_0", 50.0, full_results=True)
    assert isinstance(full[0], dict) and "distance" in full[0]
    assert gm.radius_search("zz__nope", 50.0) == []

    origin = gm.get_shape_by_ref_code("us__tn__nashville_0")
    pts = gm.radius_lat_lng_search(origin["latitude"], origin["longitude"], 50.0)
    assert all(not r["is_aggregate"] for r in pts)

    rv = gm.get_radius_shape_by_ref_code("us__tn__nashville_0")
    assert set(rv) == {
        "id", "reference_code", "latitude", "longitude", "area",
        "is_aggregate", "bbox",
    }


def test_pair_distance_and_sentinel(gm):
    d = gm.get_shape_pair_distance("us__tn__nashville_0", "us__tn__nashville_0")
    assert d["distance"] == 0.0
    missing = gm.get_shape_pair_distance("zz__a", "zz__b")
    assert missing == {"distance": 999, "normalized_distance": 999}
    dd, ref = gm.get_shape_pair_distance_id(
        "us__tn__nashville_0", gm.get_shape_id_by_ref_code("us__tn__nashville_0")
    )
    assert ref == "us__tn__nashville_0" and dd["distance"] == 0.0


def test_fuzzy_family(gm):
    res = gm.fuzzy_search("Nashville, TN", num_results=5)
    assert 0 < len(res) <= 5
    assert res[0]["clean_value"] == "nashville tn"
    assert {"id", "value", "clean_value", "ngram_similarity", "score", "distance"} <= set(
        res[0]
    )
    assert res == sorted(res, key=lambda r: -r["score"])

    best = gm.best_fuzzy_search("Nashville, TN")
    assert best is not None and best["clean_value"] == "nashville tn"
    assert gm.best_fuzzy_search("qqqxyzzy") is None

    filtered = gm.fuzzy_search(
        "Nashville", num_results=5, filters={"ref_data.state_prov": "TN"}
    )
    assert len(filtered) > 0


def test_add_entity_becomes_searchable(gm):
    gm.add_entity("Zzyzx Springs, CA", 999001)
    res = gm.fuzzy_search("Zzyzx Springs", num_results=3)
    assert any(r["id"] == 999001 for r in res)
    assert gm.num_shapes > 0


def test_preload_lookup_cache_serving_mode(spark):
    import time

    register_views(spark, "/root/testdata/sf0.001")
    gm2 = GeoManager(spark, shapes=shapes_df(spark))
    cold = gm2.get_shape_by_ref_code("us__tn__nashville_0")
    gm2.preload_lookup_cache()
    hot = gm2.get_shape_by_ref_code("us__tn__nashville_0")
    assert hot == cold                      # identical record either path
    assert gm2.get_shape_by_id(cold["id"]) == cold
    assert gm2.get_shape_by_ref_code("zz__nope") is None

    t0 = time.time()
    for _ in range(200):
        gm2.get_shape_by_ref_code("us__tn__nashville_0")
    assert time.time() - t0 < 0.5           # dict-get latency, no Spark jobs

    gm2.add_entity("Cacheville, KS", 999002)
    assert gm2._lookup_cache is None        # mutation invalidates the cache
    assert gm2.get_shape_by_id(999002) is not None
