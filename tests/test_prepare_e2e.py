"""End-to-end pipeline test (tier 2 — the PrepareGeoJSON.int.test.ts
shape): raw OSM elements → assembled features → formatted, normalized,
clustered layers → every sink format, asserted on structure and content."""

from __future__ import annotations

import json
import sqlite3

import pytest

from openskidata_processor_spark.pipeline.prepare import (
    prepare_from_elements, write_outputs)

SCHEMA = ("type string, id long, lat double, lon double, nodes array<long>, "
          "members array<struct<type:string, ref:long, role:string>>, "
          "tags map<string,string>")


def node(i, lon, lat, tags=None):
    return ("node", i, lat, lon, None, None, tags or {})


def way(i, refs, tags):
    return ("way", i, None, None, refs, None, tags)


@pytest.fixture(scope="module")
def outputs(spark, tmp_path_factory):
    out_dir = str(tmp_path_factory.mktemp("outputs"))
    # a small resort: polygon ski area, a downhill run + chair lift inside,
    # a lift station, plus a detached nordic loop far away
    elements = spark.createDataFrame([
        node(1, 11.0, 47.0), node(2, 11.01, 47.0), node(3, 11.01, 47.01),
        node(4, 11.0, 47.01),
        node(5, 11.002, 47.002), node(6, 11.004, 47.006),
        node(7, 11.003, 47.002), node(8, 11.005, 47.006),
        node(9, 11.003, 47.0021, {"aerialway": "station",
                                  "aerialway:station": "bottom"}),
        node(20, 13.0, 46.0), node(21, 13.003, 46.0),
        way(100, [1, 2, 3, 4, 1], {"landuse": "winter_sports",
                                   "name": "Test Resort"}),
        way(101, [5, 6], {"piste:type": "downhill",
                          "piste:difficulty": "easy", "name": "Home Run"}),
        way(102, [7, 8], {"aerialway": "chair_lift", "name": "Quad"}),
        way(103, [20, 21], {"piste:type": "nordic", "name": "Loipe"}),
        # lifecycle-prefixed tags must still route to their layers
        node(30, 15.0, 46.0), node(31, 15.003, 46.0),
        way(104, [30, 31], {"disused:aerialway": "t-bar",
                            "name": "Old Tbar"}),
    ], SCHEMA)
    skimap = spark.createDataFrame(
        [], "id string, name string, status string, activities array<string>,"
        " scalerank int, official_website string, geometry string")
    layers = prepare_from_elements(spark, elements, skimap)
    write_outputs(layers, out_dir)
    return layers, out_dir


def test_layers_clustered(outputs):
    layers, _ = outputs
    runs = {r.name: r for r in layers["runs"].collect()}
    sas = layers["ski_areas"].collect()
    resort = next(s for s in sas if s.name == "Test Resort")
    assert resort.id in runs["Home Run"].ski_areas
    assert resort.activities == ["downhill"]
    # detached nordic run generated its own area
    gen = [s for s in sas if s.name is None]
    assert len(gen) == 1 and gen[0].activities == ["nordic"]


def test_statistics_on_resort(outputs):
    layers, _ = outputs
    resort = next(s for s in layers["ski_areas"].collect()
                  if s.name == "Test Resort")
    assert resort.statistics["runs"]["by_activity"]["downhill"]["easy"]["count"] == 1
    assert resort.statistics["lifts"]["by_type"]["chair_lift"]["count"] == 1


def test_geojson_outputs(outputs):
    _, out_dir = outputs
    fc = json.load(open(f"{out_dir}/runs.geojson"))
    assert {f["properties"]["name"] for f in fc["features"]} == \
        {"Home Run", "Loipe"}
    mb = json.load(open(f"{out_dir}/mapboxgl_ski_areas.geojson"))
    # polygon resort renders as an interior point
    geoms = {f["geometry"]["type"] for f in mb["features"]}
    assert "Polygon" not in geoms


def test_csv_outputs(outputs, spark):
    _, out_dir = outputs
    df = spark.read.option("header", True).csv(f"{out_dir}/csv/runs")
    rows = {r.name: r for r in df.collect()}
    assert rows["Home Run"].color == "blue"  # europe convention, easy
    sa = spark.read.option("header", True).csv(f"{out_dir}/csv/ski_areas")
    resort = next(r for r in sa.collect() if r.name == "Test Resort")
    assert resort.lift_count == "1"
    assert resort.has_downhill == "yes"


def test_geopackage_output(outputs):
    _, out_dir = outputs
    con = sqlite3.connect(f"{out_dir}/openskidata.gpkg")
    tables = {r[0] for r in con.execute(
        "SELECT table_name FROM gpkg_contents")}
    # geometry-type-suffixed tables + the ski-area centroid point layer
    # (GeoPackageWriter.ts:534-585)
    assert "runs_linestring" in tables
    assert "lifts_linestring" in tables
    assert "spots_point" in tables
    assert "ski_areas_point" in tables
    assert not any(t.endswith("_polygon") and not t.endswith("_multipolygon")
                   for t in tables)
    n, = con.execute("SELECT count(*) FROM runs_linestring").fetchone()
    assert n == 2


def test_lifecycle_prefixed_routing(outputs):
    layers, _ = outputs
    old = next(r for r in layers["lifts"].collect() if r.name == "Old Tbar")
    assert old.status == "disused"
    assert old.lift_type == "t-bar"


def test_viewport_hints_attached(outputs):
    layers, out_dir = outputs
    # every layer carries a hint; 2D pipeline (no elevation caches) → null
    # bearing, real center/extents
    run = next(r for r in layers["runs"].collect() if r.name == "Home Run")
    assert run.viewport_hint.bearing is None
    assert run.viewport_hint.rotated_width_meters > 0
    # ski-area hint spans its member geometries, not just its own polygon
    resort = next(s for s in layers["ski_areas"].collect()
                  if s.name == "Test Resort")
    assert resort.viewport_hint is not None
    # hint is exported as a GeoJSON property
    fc = json.load(open(f"{out_dir}/runs.geojson"))
    hint = fc["features"][0]["properties"]["viewport_hint"]
    assert set(hint) == {"bearing", "center", "min_camera_y",
                         "rotated_height_meters", "rotated_width_meters"}


def test_reference_shape_geojson(outputs, spark, tmp_path_factory):
    """The reference-contract export: camelCase property keys, type from
    feature_type, skiAreas embedded as summary FEATURES (toSkiAreaSummary),
    lifts carrying stations[] features (FeatureExporter.ts:95-161)."""
    layers, _ = outputs
    out_dir = str(tmp_path_factory.mktemp("refshape"))
    write_outputs(layers, out_dir, geopackage=False, reference_shape=True)
    runs = json.load(open(f"{out_dir}/runs.geojson"))
    home = next(f for f in runs["features"]
                if f["properties"]["name"] == "Home Run")
    p = home["properties"]
    assert p["type"] == "run"
    assert "difficultyConvention" in p and "wikidataID" in p
    assert "ski_areas" not in p and "feature_type" not in p
    sa = p["skiAreas"][0]
    assert sa["type"] == "Feature"
    assert sa["properties"]["name"] == "Test Resort"
    assert set(sa["properties"]) == {"activities", "id", "name", "status",
                                     "type"}
    assert sa["geometry"]["type"] in ("Polygon", "Point")
    assert p["viewportHint"] is not None \
        and "minCameraY" in p["viewportHint"]
    lifts = json.load(open(f"{out_dir}/lifts.geojson"))
    lp = lifts["features"][0]["properties"]
    assert "stations" in lp and isinstance(lp["stations"], list)
    assert lp["liftType"] in ("chair_lift", "t-bar")
    areas = json.load(open(f"{out_dir}/ski_areas.geojson"))
    ap = next(f["properties"] for f in areas["features"]
              if f["properties"]["name"] == "Test Resort")
    stats = ap["statistics"]
    assert "byActivity" in stats["runs"]
    assert stats["runs"]["byActivity"]["downhill"]["byDifficulty"]["easy"][
        "count"] == 1
    assert stats["lifts"]["byType"]["chair_lift"]["count"] == 1


def test_mapbox_contract(outputs):
    """mapboxgl_*.geojson property contract (MapboxGLFormatter.ts +
    PrepareGeoJSON.int.test.ts snapshots): one feature per run with
    per-use offset columns, colorName + hsl color, lift name_and_type,
    ski-area rounded stats, spots layer present."""
    _, out_dir = outputs
    runs = json.load(open(f"{out_dir}/mapboxgl_runs.geojson"))
    home = next(f["properties"] for f in runs["features"]
                if f["properties"]["name"] == "Home Run")
    assert home["downhill"] == 0.0          # single use → centered offset
    assert home["nordic"] is None
    assert home["colorName"] == "blue"
    assert home["color"] == "hsl(208, 100%, 33%)"  # snapshot-verified value
    assert isinstance(home["skiAreas"], list) and home["skiAreas"]
    lifts = json.load(open(f"{out_dir}/mapboxgl_lifts.geojson"))
    quad = next(f["properties"] for f in lifts["features"])
    assert quad["name_and_type"] == "Quad (Chairlift)"
    assert quad["color"] == "hsl(0, 82%, 42%)"     # operating, verified
    assert "stationIds" in quad
    areas = json.load(open(f"{out_dir}/mapboxgl_ski_areas.geojson"))
    resort = next(f["properties"] for f in areas["features"]
                  if f["properties"]["name"] == "Test Resort")
    assert resort["has_downhill"] is True
    assert "downhillDistance" in resort and "vertical" in resort
    assert json.load(open(f"{out_dir}/mapboxgl_spots.geojson"))[
        "type"] == "FeatureCollection"


def test_mapbox_polygon_areas_export_as_points(outputs):
    """MapboxGLFormatter: polygon ski areas render as interior POINTS
    (centralPointsInFeature — 'should export polygon ski area as point
    geometry'); the point must fall inside the polygon's bbox."""
    _, out_dir = outputs
    areas = json.load(open(f"{out_dir}/mapboxgl_ski_areas.geojson"))
    resort = next(f for f in areas["features"]
                  if f["properties"]["name"] == "Test Resort")
    assert resort["geometry"]["type"] in ("Point", "MultiPoint")
    if resort["geometry"]["type"] == "Point":
        lon, lat = resort["geometry"]["coordinates"][:2]
        assert 11.0 <= lon <= 11.2 and 47.0 <= lat <= 47.3


class TestPrepareWithElevation:
    """PrepareGeoJSONWithElevation.int.test.ts shape: the full pipeline
    with elevation caches — 3D geometries, run elevation profiles, and
    graceful 2D completion when every lookup misses (server-failure
    vector)."""

    @pytest.fixture(scope="class")
    def elevated(self, spark, tmp_path_factory):
        from openskidata_processor_spark.pipeline.enrichment import \
            geohash_encode
        from openskidata_processor_spark.pipeline.prepare import \
            prepare_from_elements

        elements = spark.createDataFrame([
            node(1, 11.0, 47.0), node(2, 11.01, 47.0),
            node(3, 11.01, 47.01), node(4, 11.0, 47.01),
            node(5, 11.002, 47.002), node(6, 11.004, 47.006),
            node(7, 11.003, 47.002), node(8, 11.005, 47.006),
            way(100, [1, 2, 3, 4, 1], {"landuse": "winter_sports",
                                       "name": "Test Resort"}),
            way(101, [5, 6], {"piste:type": "downhill", "name": "Home Run"}),
            way(102, [7, 8], {"aerialway": "chair_lift", "name": "Quad"}),
        ], SCHEMA)
        skimap = spark.createDataFrame(
            [], "id string, name string, status string,"
            " activities array<string>, scalerank int,"
            " official_website string, geometry string")

        # a dense synthetic DEM: every geohash-10 cell in the resort bbox
        # maps to a deterministic elevation (lat-derived, so the run's two
        # endpoints differ)
        cells = {}
        lat = 46.999
        while lat < 47.012:
            lon = 10.999
            while lon < 11.012:
                cells[geohash_encode(lon, lat, 10)] = round(
                    1000 + (lat - 47.0) * 100000, 1)
                lon += 0.00004
            lat += 0.00004
        cache = spark.createDataFrame(
            list(cells.items()), "key string, elevation double")
        layers = prepare_from_elements(spark, elements, skimap,
                                       elevation_caches=[cache])
        return {k: v.collect() for k, v in layers.items()}

    def test_run_geometry_is_3d_with_profile(self, elevated):
        run = next(r for r in elevated["runs"] if r.name == "Home Run")
        coords = json.loads(run.geometry)["coordinates"]
        assert all(len(c) == 3 for c in coords)
        # lat-derived DEM: higher latitude → higher elevation
        assert coords[1][2] > coords[0][2]
        prof = run.elevation_profile
        assert prof is not None
        assert prof.target_resolution == 25
        assert 0 < prof.resolution <= 25
        assert len(prof.heights) >= 2
        assert prof.heights[0] == pytest.approx(coords[0][2], abs=6.0)
        assert prof.heights[-1] == pytest.approx(coords[-1][2], abs=6.0)

    def test_lift_and_spot_geometry_is_3d(self, elevated):
        lift = next(r for r in elevated["lifts"] if r.name == "Quad")
        assert all(len(c) == 3
                   for c in json.loads(lift.geometry)["coordinates"])

    def test_viewport_hint_elevation_aware(self, elevated):
        run = next(r for r in elevated["runs"] if r.name == "Home Run")
        # 3D geometry → bearing computed (downhill direction exists)
        assert run.viewport_hint.bearing is not None

    def test_all_miss_cache_completes_2d(self, spark):
        from openskidata_processor_spark.pipeline.prepare import \
            prepare_from_elements
        elements = spark.createDataFrame([
            node(5, 11.002, 47.002), node(6, 11.004, 47.006),
            way(101, [5, 6], {"piste:type": "downhill", "name": "Home Run"}),
        ], SCHEMA)
        skimap = spark.createDataFrame(
            [], "id string, name string, status string,"
            " activities array<string>, scalerank int,"
            " official_website string, geometry string")
        empty_cache = spark.createDataFrame(
            [], "key string, elevation double")
        layers = prepare_from_elements(spark, elements, skimap,
                                       elevation_caches=[empty_cache])
        run = next(r for r in layers["runs"].collect()
                   if r.name == "Home Run")
        coords = json.loads(run.geometry)["coordinates"]
        assert all(len(c) == 2 for c in coords)
        assert run.elevation_profile is None
