"""Enrichment tests: elevation cache join, geohash, terrain math,
geocoding places, VIIRS pixels, snow-cover history aggregation."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from openskidata_processor_spark.pipeline import enrichment as en


def test_geohash_known_value():
    # canonical example from the public geohash spec
    assert en.geohash_encode(-5.6, 42.6, 5) == "ezs42"
    assert en.geohash_encode(13.361389, 38.115556, 7) == "sqc8b49"


def test_mercator_tile_and_decode(spark):
    df = spark.range(1).select(F.lit(11.39).alias("lon"),
                               F.lit(47.27).alias("lat"))
    t = en.mercator_tile(F.col("lon"), F.col("lat"), 14)
    row = df.select(t["tile_x"].alias("x"), t["tile_y"].alias("y")).first()
    # zoom-14 tile containing Innsbruck: x=8710, y=5744 (public slippy math)
    assert (row.x, row.y) == (8710, 5744)
    d = spark.range(1).select(
        en.decode_terrain_rgb(F.lit(1), F.lit(134), F.lit(160)).alias("e"),
        en.decode_terrarium(F.lit(130), F.lit(70), F.lit(0)).alias("t")).first()
    assert abs(d.e - (-10000 + (65536 + 134 * 256 + 160) * 0.1)) < 1e-6
    assert abs(d.t - (130 * 256 + 70 - 32768)) < 1e-6


def test_add_elevation_with_fallback(spark):
    line = json.dumps({"type": "LineString",
                       "coordinates": [[11.1, 47.1], [11.2, 47.2]]})
    feats = spark.createDataFrame([("f1", line)], "id string, geometry string")
    k1 = en.geohash_encode(11.1, 47.1, 10)
    k2 = en.geohash_encode(11.2, 47.2, 10)
    primary = spark.createDataFrame([(k1, 1000.04)], "key string, elev double")
    fallback = spark.createDataFrame([(k1, 555.0), (k2, 2000.06)],
                                     "key string, elev double")
    out = en.add_elevation(feats, primary, fallback).collect()[0]
    coords = json.loads(out.geometry)["coordinates"]
    assert coords[0] == [11.1, 47.1, 1000.0]  # primary wins, rounded 0.1
    assert coords[1] == [11.2, 47.2, 2000.1]  # W2 fallback fills the miss


def test_elevation_cache_misses(spark):
    line = json.dumps({"type": "LineString",
                       "coordinates": [[11.1, 47.1], [11.2, 47.2]]})
    feats = spark.createDataFrame([("f1", line)], "id string, geometry string")
    k1 = en.geohash_encode(11.1, 47.1, 10)
    cache = spark.createDataFrame([(k1, 1.0)], "key string, elev double")
    misses = [r.key for r in en.elevation_cache_misses(feats, cache).collect()]
    assert misses == [en.geohash_encode(11.2, 47.2, 10)]


def test_add_elevation_point_and_polygon(spark):
    """J9 parity: Points and Polygon rings get 3D coords too
    (Elevation.ts:447-495), with a pre-existing z replaced."""
    pt = json.dumps({"type": "Point", "coordinates": [11.1, 47.1, 99.0]})
    poly = json.dumps({"type": "Polygon", "coordinates": [[
        [11.1, 47.1], [11.2, 47.2], [11.3, 47.1], [11.1, 47.1]]]})
    feats = spark.createDataFrame([("p1", pt), ("g1", poly)],
                                  "id string, geometry string")
    cache = spark.createDataFrame(
        [(en.geohash_encode(11.1, 47.1, 10), 1000.0),
         (en.geohash_encode(11.2, 47.2, 10), 2000.0)],
        "key string, elev double")
    rows = {r.id: json.loads(r.geometry)
            for r in en.add_elevation(feats, cache).collect()}
    assert rows["p1"]["coordinates"] == [11.1, 47.1, 1000.0]
    ring = rows["g1"]["coordinates"][0]
    assert ring[0] == [11.1, 47.1, 1000.0]
    assert ring[1] == [11.2, 47.2, 2000.0]
    assert ring[2] == [11.3, 47.1]          # cache miss keeps 2D
    assert ring[3] == [11.1, 47.1, 1000.0]  # closing coord elevated too


def test_add_places(spark):
    line = json.dumps({"type": "LineString",
                       "coordinates": [[11.1, 47.1], [11.2, 47.2]]})
    feats = spark.createDataFrame([("f1", line)], "id string, geometry string")
    key = en.geohash_encode(11.1, 47.1, 6)
    cache = spark.createDataFrame(
        [(key, ("AT", "AT-7", "Austria", "Tyrol", "Innsbruck"))],
        "key string, place struct<iso3166_1:string, iso3166_2:string,"
        " country:string, region:string, locality:string>")
    out = en.add_places(feats, cache).collect()[0]
    assert out.places[0]["country"] == "Austria"


def test_viirs_pixel_alps(spark):
    df = spark.range(1).select(
        en.viirs_pixel(F.lit(11.0), F.lit(47.0)).alias("p"))
    h, v, c, r = df.first().p
    # Alps: MODIS/VIIRS tile h18 v04 (public sinusoidal grid)
    assert (h, v) == (18, 4)
    assert 0 <= c < 3000 and 0 <= r < 3000


def test_snow_cover_history(spark):
    pt = json.dumps({"type": "Point", "coordinates": [11.0, 47.0]})
    feats = spark.createDataFrame([("f1", pt)], "id string, geometry string")
    # pixel key must match the engine's own pixel math
    p = spark.range(1).select(
        en.viirs_pixel(F.lit(11.0), F.lit(47.0)).alias("p")).first().p
    key = ":".join(str(v) for v in p)
    cache = spark.createDataFrame(
        [
            (key, 2023, 1, 80, 0),     # week 1, no cloud → Jan 1 (day 1)
            (key, 2023, 1, 60, 0),     # duplicate same day, same cloud
            (key, 2023, 2, 50, 1),     # week 2 − 1 day cloud → day 7
            (key, 2023, 2, 90, 3),     # week 2 − 3 days → day 5
            (key, 2023, 1, 301, 0),    # invalid snow code → dropped
            (key, 2022, 53, 40, 10),   # cloud pushes into 2022 (day 355)
        ],
        "pixel_key string, year int, week int, snow int, cloud int")
    out = en.snow_cover_history(feats, cache).collect()[0]
    hist = {y["year"]: [(d["day"], d["avg_snow"], d["valid_pct"])
                        for d in y["days"]]
            for y in out.snow_cover_history}
    assert set(hist.keys()) == {2022, 2023}
    days_2023 = dict((d, (s, v)) for d, s, v in hist[2023])
    assert set(days_2023) == {1, 5, 7}
    assert days_2023[5] == (90, 100)
    assert days_2023[7] == (50, 100)


def test_snow_cover_cloud_pushes_to_previous_year(spark):
    """snowCoverHistory.unit.test.ts:37 — cloud persistence on week 1
    lands the measurement in the PREVIOUS year (day-of-year wraps)."""
    pt = json.dumps({"type": "Point", "coordinates": [11.0, 47.0]})
    feats = spark.createDataFrame([("f1", pt)], "id string, geometry string")
    p = spark.range(1).select(
        en.viirs_pixel(F.lit(11.0), F.lit(47.0)).alias("p")).first().p
    key = ":".join(str(v) for v in p)
    cache = spark.createDataFrame(
        [(key, 2023, 1, 70, 3)],  # Jan 1 − 3 days = 2022-12-29 (day 363)
        "pixel_key string, year int, week int, snow int, cloud int")
    out = en.snow_cover_history(feats, cache).collect()[0]
    hist = {y["year"]: [(d["day"], d["avg_snow"]) for d in y["days"]]
            for y in out.snow_cover_history}
    assert hist == {2022: [(363, 70)]}


def test_elevation_profile(spark):
    # ~2.2 km line → 89 segments at 25 m target → 90 sampled heights
    line = json.dumps({"type": "LineString",
                       "coordinates": [[11.0, 47.0], [11.0, 47.02]]})
    feats = spark.createDataFrame([("r1", line)], "id string, geometry string")
    # cache covering every sampled geohash on the meridian segment
    keys = {en.geohash_encode(11.0, 47.0 + i * 0.0001, 10): 1000.0 + i
            for i in range(205)}
    cache = spark.createDataFrame(list(keys.items()), "key string, e double")
    out = en.add_elevation_profile(feats, cache).collect()[0]
    prof = out.elevation_profile
    assert prof is not None
    assert prof["target_resolution"] == 25
    assert 24.0 <= prof["resolution"] <= 25.0
    n = len(prof["heights"])
    assert n == 90  # ceil(2225m / 25) + 1
    assert prof["heights"][0] == 1000.0


def test_viewport_hint_reference_vectors():
    """compute_viewport_hint against the reference's inline-snapshot vectors
    (openskidata-format computeViewportHint; tolerance covers JS/C libm
    float noise in the published doubles)."""
    from openskidata_processor_spark.functions.geometry import (
        compute_viewport_hint)

    # RunFormatter.unit.test.ts:67-76 — 2D LineString (0,0)→(1,1)
    b, c, mcy, h, w = compute_viewport_hint(
        [{"type": "LineString", "coordinates": [[0, 0], [1, 1]]}])
    assert b is None
    assert c == [0.5, 0.5]
    assert mcy == -55660.0
    assert h == 111320.0
    assert w == 111315.76127550355

    # PrepareGeoJSONWithElevation.int.test.ts:322-330 — same lift, 2D
    # (elevation fetch failed → bearing null, axis-aligned extents)
    lift2d = {"type": "LineString",
              "coordinates": [[11.1223444, 47.5572422],
                              [11.1164297, 47.5581563]]}
    b, c, mcy, h, w = compute_viewport_hint([lift2d])
    assert b is None
    assert abs(c[0] - 11.11938705) < 1e-12
    assert abs(c[1] - 47.55769924999999) < 1e-12
    assert abs(mcy - -50.87880600015609) < 1e-6
    assert abs(h - 101.75761200110317) < 1e-6
    assert abs(w - 444.3359945090548) < 1e-6

    # PrepareGeoJSONWithElevation.int.test.ts:133-141 — 3D lift: camera
    # bearing = bearing(highest→lowest) + 210, elevation folds into
    # screen-y extents
    lift3d = {"type": "LineString",
              "coordinates": [[11.1223444, 47.5572422, 0],
                              [11.1164297, 47.5581563, 1]]}
    b, c, mcy, h, w = compute_viewport_hint([lift3d])
    assert abs(b - 312.89672520119075) < 1e-9
    assert abs(mcy - -197.8883671355343) < 1e-6
    assert abs(h - 395.7767342717046) < 1e-6
    assert abs(w - 227.90440472769652) < 1e-6


def test_viewport_hint_udf(spark):
    from openskidata_processor_spark.functions.geometry import viewport_hint_udf
    line3d = json.dumps({"type": "LineString",
                         "coordinates": [[11.0, 47.0, 2000.0],
                                         [11.0, 47.01, 1500.0]]})
    line2d = json.dumps({"type": "LineString",
                         "coordinates": [[11.0, 47.0], [11.0, 47.01]]})
    df = spark.createDataFrame([(line3d,), (line2d,)], "geometry string")
    rows = df.select(viewport_hint_udf("geometry").alias("v")).collect()
    v3, v2 = rows[0].v, rows[1].v
    assert abs(v3["center"][1] - 47.005) < 1e-9
    # downhill is due north (high z at south end); camera = north + 210
    assert abs(v3["bearing"] - 210.0) < 1e-9
    assert v2["bearing"] is None           # 2D → graceful top-down fallback
    assert abs(v2["rotated_height_meters"] - 0.01 * 111320.0) < 1e-6


def test_geohash_decode_roundtrip():
    from openskidata_processor_spark.sources.fetch import geohash_decode
    for lon, lat in ((-5.6, 42.6), (13.361389, 38.115556),
                     (11.1164297, 47.5581563), (-170.0, -80.0)):
        gh = en.geohash_encode(lon, lat, 10)
        dlat, dlon = geohash_decode(gh)
        # precision-10 cell is ~1.2m; the center is within half a cell
        assert abs(dlat - lat) < 1e-4 and abs(dlon - lon) < 1e-4


def test_fetch_stage_closes_miss_loop(spark):
    """miss set → batched fake fetch → updated cache → add_elevation now
    elevates the previously-2D feature (the reference's
    batchLoadElevations loop, Elevation.ts:160-246, as engine stages)."""
    from openskidata_processor_spark.sources import fetch as fx
    line = json.dumps({"type": "LineString",
                       "coordinates": [[11.1, 47.1], [11.2, 47.2]]})
    feats = spark.createDataFrame([("f1", line)], "id string, geometry string")
    k1 = en.geohash_encode(11.1, 47.1, 10)
    cache = spark.createDataFrame([(k1, 1000.0)], "key string, elev double")
    misses = en.elevation_cache_misses(feats, cache)
    assert [r.key for r in misses.collect()] == \
        [en.geohash_encode(11.2, 47.2, 10)]

    def fake_fetch(coords):
        # encode the decoded coordinate into the value so the assertion
        # below proves the geohash→(lat, lon) decode reached the fetcher
        return [round(lat * 100.0) for lat, lon in coords]

    fetched = fx.fetch_elevation_updates(misses.coalesce(1), fake_fetch,
                                         batch_size=100)
    new_cache = fx.updated_cache(cache, fetched)
    assert new_cache.count() == 2
    out = en.add_elevation(feats, new_cache).first()
    coords = json.loads(out.geometry)["coordinates"]
    assert coords[0][2] == 1000.0  # pre-existing cache row untouched
    assert coords[1][2] == 4720.0  # fetched: round(47.2 * 100)


def test_fetch_stage_never_caches_errors(spark):
    from openskidata_processor_spark.sources import fetch as fx
    misses = spark.createDataFrame(
        [(en.geohash_encode(11.0, 47.0, 10),),
         (en.geohash_encode(12.0, 48.0, 10),)], "key string")

    def failing_fetch(coords):
        raise RuntimeError("server down")

    fetched = fx.fetch_elevation_updates(misses, failing_fetch)
    assert fetched.count() == 0  # errors never cached (Elevation.ts:224)


def test_geocode_fetch_closes_miss_loop(spark):
    """Geocode misses → fake photon fetch → cache union → add_places now
    populates ``places`` (Geocoder.ts:111-208 as engine stages)."""
    from openskidata_processor_spark.sources import fetch as fx
    line = json.dumps({"type": "LineString",
                       "coordinates": [[11.1, 47.1], [11.2, 47.2]]})
    feats = spark.createDataFrame([("f1", line)], "id string, geometry string")
    empty_cache = spark.createDataFrame(
        [], f"key string, place {fx.GEOCODE_PLACE_DDL}")

    misses = fx.geocode_cache_misses(feats, empty_cache)
    n_miss = misses.count()
    assert n_miss >= 2  # both endpoints sampled at minimum

    def fake_fetch(lat, lon):
        # encode the decoded coordinate so the assertion proves the
        # geohash→center decode reached the fetcher
        return {"iso3166_1": "AT", "iso3166_2": None,
                "country": f"c{round(lat)}", "region": None,
                "locality": None}

    fetched = fx.fetch_geocode_updates(misses, fake_fetch,
                                       retry_delay_s=0.0)
    new_cache = fx.updated_cache(empty_cache, fetched)
    assert new_cache.count() == n_miss
    assert fx.geocode_cache_misses(feats, new_cache).count() == 0
    out = en.add_places(feats, new_cache).first()
    assert len(out.places) >= 1
    assert out.places[0]["iso3166_1"] == "AT"
    assert out.places[0]["country"] == "c47"


def test_geocode_fetch_retry_and_null_place(spark, tmp_path):
    """A request that fails once succeeds on the reference's single retry
    (Geocoder.ts:197-207); a successful null geocode IS cached.

    Executor-side call counting goes through a file — closures don't
    mutate driver state from Python workers."""
    from openskidata_processor_spark.sources import fetch as fx
    misses = spark.createDataFrame(
        [(en.geohash_encode(11.0, 47.0, 6),)], "key string")
    marker = str(tmp_path / "calls")

    def flaky_then_null(lat, lon):
        with open(marker, "a") as f:
            f.write("x")
        if os.path.getsize(marker) == 1:
            raise RuntimeError("transient")
        return None

    fetched = fx.fetch_geocode_updates(misses.coalesce(1), flaky_then_null,
                                       max_concurrent=1, retry_delay_s=0.0)
    rows = fetched.collect()
    assert len(rows) == 1 and rows[0].place is None
    assert os.path.getsize(marker) == 2  # initial attempt + one retry


def test_geocode_fetch_error_budget_abort(spark, tmp_path):
    """After ``max_errors`` consecutive failures the task stops fetching
    ("Too many errors, not trying remote", Geocoder.ts:168-171); skipped
    keys surface as misses again."""
    from openskidata_processor_spark.sources import fetch as fx
    keys = [(en.geohash_encode(10.0 + i * 0.1, 45.0, 6),) for i in range(10)]
    misses = spark.createDataFrame(keys, "key string")
    marker = str(tmp_path / "attempts")

    def always_fail(lat, lon):
        with open(marker, "a") as f:
            f.write("x")
        raise RuntimeError("down")

    fetched = fx.fetch_geocode_updates(misses.coalesce(1), always_fail,
                                       max_concurrent=1, max_errors=3,
                                       retry_delay_s=0.0)
    assert fetched.count() == 0
    # 3 keys × 2 attempts (retry-once) then abort — not 10 × 2
    assert os.path.getsize(marker) == 6


def test_add_places_sort_and_dedupe_parity(spark):
    """PlaceUtils.ts parity: sort by locality, region, country with nulls
    LAST; dedupe on (iso3166_1, iso3166_2, locality) — region spelling
    variants of the same key collapse to one deterministic pick."""
    ln = json.dumps({"type": "LineString",
                     "coordinates": [[11.0, 47.0], [11.0, 47.05]]})
    feats = spark.createDataFrame([("f1", ln)], "id string, geometry string")
    keys = [r.key for r in feats.select(
        F.explode(en.geometry_geohashes(1.0, 6)(F.col("geometry")))
        .alias("key")).collect()]
    assert len(keys) >= 3
    mk = ("struct<iso3166_1:string, iso3166_2:string, country:string,"
          " region:string, locality:string>")
    cache = spark.createDataFrame(
        [(keys[0], ("AT", "AT-7", "Austria", "Tyrol", "Zirl")),
         (keys[1], ("AT", "AT-7", "Austria", None, None)),     # nulls → last
         (keys[2], ("AT", "AT-7", "Austria", "Tirol", "Zirl"))],  # dup key3
        f"key string, place {mk}")
    out = en.add_places(feats, cache).collect()[0]
    places = [(p["locality"], p["region"], p["country"])
              for p in out.places]
    # the two Zirl variants collapse (key: iso1, iso2, locality) to the
    # min-struct pick ("Tirol" < "Tyrol"); the null-locality row sorts last
    assert places == [("Zirl", "Tirol", "Austria"),
                      (None, None, "Austria")]


class TestViirsRasterization:
    """VIIRSPixelExtractor.unit.test.ts vectors over the full bbox-scan
    rasterizer (pixel squares intersecting the geometry, not just its
    vertices)."""

    def _pixels(self, spark, geom):
        rows = spark.createDataFrame(
            [(json.dumps(geom),)], "geometry string").select(
            en.geometry_viirs_pixels(F.col("geometry")).alias("p")).first().p
        return {tuple(int(v) for v in t) for t in rows}

    def test_polygon_covers_interior(self, spark):
        # ~1.1 km square at the equator ≈ 3×3 pixels at 375 m — the
        # interior pixel has no vertex on it, so vertex-only extraction
        # would miss it
        poly = {"type": "Polygon", "coordinates": [[
            [0.0, 0.0], [0.01, 0.0], [0.01, 0.01], [0.0, 0.01],
            [0.0, 0.0]]]}
        pixels = self._pixels(spark, poly)
        assert len(pixels) >= 9
        # every vertex pixel is included (squares touching the boundary)
        for lon, lat in [(0.0, 0.0), (0.01, 0.0), (0.01, 0.01),
                         (0.0, 0.01)]:
            vp = spark.range(1).select(en.viirs_pixel(
                F.lit(lon), F.lit(lat)).alias("p")).first().p
            assert tuple(int(v) for v in vp) in pixels
        for h, v, c, r in pixels:
            assert 0 <= h <= 35 and 0 <= v <= 17
            assert 0 <= c < 3000 and 0 <= r < 3000

    def test_linestring_covers_path(self, spark):
        line = {"type": "LineString",
                "coordinates": [[-74.0, 40.7], [-73.9, 40.8]]}
        pixels = self._pixels(spark, line)
        # a ~14 km diagonal crosses ≥ 20 pixels — endpoints included
        assert len(pixels) >= 20
        for lon, lat in line["coordinates"]:
            vp = spark.range(1).select(en.viirs_pixel(
                F.lit(lon), F.lit(lat)).alias("p")).first().p
            assert tuple(int(v) for v in vp) in pixels

    def test_tiny_polygon_yields_at_least_one(self, spark):
        tiny = {"type": "Polygon", "coordinates": [[
            [0.0, 0.0], [0.00001, 0.0], [0.00001, 0.00001],
            [0.0, 0.00001], [0.0, 0.0]]]}
        pixels = self._pixels(spark, tiny)
        assert len(pixels) >= 1

    def test_point_is_single_pixel(self, spark):
        pt = {"type": "Point", "coordinates": [11.0, 47.0]}
        pixels = self._pixels(spark, pt)
        vp = spark.range(1).select(en.viirs_pixel(
            F.lit(11.0), F.lit(47.0)).alias("p")).first().p
        assert pixels == {tuple(int(v) for v in vp)}

    def test_polygon_hole_boundary_still_covered(self, spark):
        # ring with a hole: hole boundary pixels intersect the polygon's
        # covered region (squares straddle the hole edge)
        poly = {"type": "Polygon", "coordinates": [
            [[0.0, 0.0], [0.02, 0.0], [0.02, 0.02], [0.0, 0.02],
             [0.0, 0.0]],
            [[0.008, 0.008], [0.012, 0.008], [0.012, 0.012],
             [0.008, 0.012], [0.008, 0.008]]]}
        with_hole = self._pixels(spark, poly)
        solid = self._pixels(spark, {
            "type": "Polygon", "coordinates": [poly["coordinates"][0]]})
        assert with_hole <= solid
        assert len(with_hole) >= 16
