"""GeoPackage writer behavior suite — the table-routing / schema vectors
of the reference's GeoPackageWriter.unit.test.ts, against the sqlite-lite
sink (same assertions, pysqlite instead of the gpkg library).

Covered vectors: lift layer schema (:40), line features (:97, in
test_sinks), ski-area dual export (:151, in test_sinks), existing
multipolygon ski areas (:209), polygon→multipolygon for non-ski-area
features (:274), mixed property types (:334), mixed geometry types →
separate tables (:469), skiAreas → ski_area_ids/names columns (:567),
missing ids/names (:709), features without skiAreas (:808).
"""

from __future__ import annotations

import json
import sqlite3

import pytest
from pyspark.sql import functions as F

from openskidata_processor_spark.pipeline import formatters as fmt
from openskidata_processor_spark.sinks import geopackage
from test_formatters import RAW_SCHEMA, raw

LINE = json.dumps({"type": "LineString",
                   "coordinates": [[11.1, 47.1], [11.2, 47.2]]})
POLY = json.dumps({"type": "Polygon", "coordinates": [
    [[0.0, 0.0], [10.0, 0.0], [10.0, 10.0], [0.0, 10.0], [0.0, 0.0]]]})
MPOLY = json.dumps({"type": "MultiPolygon", "coordinates": [
    [[[0.0, 0.0], [10.0, 0.0], [10.0, 10.0], [0.0, 10.0], [0.0, 0.0]]],
    [[[20.0, 20.0], [30.0, 20.0], [30.0, 30.0], [20.0, 30.0],
      [20.0, 20.0]]]]})


def tables_of(path):
    con = sqlite3.connect(path)
    return con, {r[0] for r in con.execute(
        "SELECT table_name FROM gpkg_contents")}


def test_lift_layer_schema(spark, tmp_path):
    lifts = fmt.format_lifts(raw(spark, [
        ({"aerialway": "chair_lift", "name": "Lift A",
          "aerialway:occupancy": "4", "aerialway:bubble": "yes"}, LINE)]))
    path = str(tmp_path / "l.gpkg")
    geopackage.write_geopackage({"lifts": lifts}, path)
    con, tables = tables_of(path)
    assert tables == {"lifts_linestring"}
    cols = {r[1]: r[2] for r in con.execute(
        "PRAGMA table_info(lifts_linestring)")}
    # typed schema (GeoPackageWriter.ts:183-259)
    assert cols["feature_id"] == "TEXT"
    assert cols["occupancy"] == "REAL"
    assert cols["bubble"] == "BOOLEAN"
    assert cols["ski_area_ids"] == "TEXT"
    r = con.execute(
        "SELECT name, lift_type, occupancy, bubble, status FROM"
        " lifts_linestring").fetchone()
    assert r == ("Lift A", "chair_lift", 4.0, 1, "operating")


def test_existing_multipolygon_ski_area(spark, tmp_path):
    areas = fmt.format_ski_areas_osm(raw(spark, [
        ({"landuse": "winter_sports", "name": "Complex"}, MPOLY)]))
    path = str(tmp_path / "m.gpkg")
    geopackage.write_geopackage({"ski_areas": areas}, path)
    con, tables = tables_of(path)
    assert "ski_areas_point" in tables
    assert "ski_areas_multipolygon" in tables
    n, = con.execute("SELECT count(*) FROM ski_areas_point").fetchone()
    assert n == 1
    n, = con.execute("SELECT count(*) FROM ski_areas_multipolygon").fetchone()
    assert n == 1


def test_polygon_runs_become_multipolygon_without_point_layer(spark,
                                                             tmp_path):
    runs = fmt.format_runs(raw(spark, [
        ({"piste:type": "downhill", "name": "Bowl"}, POLY)]))
    path = str(tmp_path / "p.gpkg")
    geopackage.write_geopackage({"runs": runs}, path)
    con, tables = tables_of(path)
    # :274-331 — multipolygon table only; no point layer for runs, and
    # never a _polygon table
    assert tables == {"runs_multipolygon"}
    blob, = con.execute("SELECT geom FROM runs_multipolygon").fetchone()
    assert int.from_bytes(blob[9:13], "little") == 6  # MultiPolygon WKB


def test_mixed_geometry_types_create_separate_tables(spark, tmp_path):
    runs = fmt.format_runs(raw(spark, [
        ({"piste:type": "downhill", "name": "Line Run"}, LINE),
        ({"piste:type": "downhill", "name": "Area Run"}, POLY)]))
    path = str(tmp_path / "mix.gpkg")
    geopackage.write_geopackage({"runs": runs}, path)
    con, tables = tables_of(path)
    assert tables == {"runs_linestring", "runs_multipolygon"}
    assert con.execute(
        "SELECT count(*) FROM runs_linestring").fetchone() == (1,)
    assert con.execute(
        "SELECT count(*) FROM runs_multipolygon").fetchone() == (1,)


def _runs_with_ski_areas(spark, sa_ids):
    runs = fmt.format_runs(raw(spark, [
        ({"piste:type": "downhill", "name": "R1"}, LINE)]))
    return runs.withColumn(
        "ski_areas", F.array(*[F.lit(i) for i in sa_ids]).cast(
            "array<string>"))


def _sa_summary(spark, rows):
    return spark.createDataFrame(rows, "id string, name string")


def test_ski_area_ids_and_names_columns(spark):
    runs = _runs_with_ski_areas(spark, ["area-1", "area-2"])
    sa = _sa_summary(spark, [("area-1", "Alpha"), ("area-2", "Beta")])
    from openskidata_processor_spark.sinks.geopackage import gpkg_project
    proj, _ = gpkg_project(runs, "run", ski_areas=sa)
    r = proj.select("ski_area_ids", "ski_area_names").collect()[0]
    assert r.ski_area_ids == "area-1,area-2"
    assert r.ski_area_names == "Alpha,Beta"


def test_ski_areas_with_missing_names(spark):
    # :709 — names with null are filtered from ski_area_names, ids kept
    runs = _runs_with_ski_areas(spark, ["area-1", "area-2"])
    sa = _sa_summary(spark, [("area-1", None), ("area-2", "Beta")])
    from openskidata_processor_spark.sinks.geopackage import gpkg_project
    proj, _ = gpkg_project(runs, "run", ski_areas=sa)
    r = proj.select("ski_area_ids", "ski_area_names").collect()[0]
    assert r.ski_area_ids == "area-1,area-2"
    assert r.ski_area_names == "Beta"


def test_features_without_ski_areas(spark):
    # :808 — empty skiAreas → null ids/names columns
    runs = fmt.format_runs(raw(spark, [
        ({"piste:type": "downhill", "name": "Solo"}, LINE)]))
    sa = _sa_summary(spark, [("area-1", "Alpha")])
    from openskidata_processor_spark.sinks.geopackage import gpkg_project
    proj, _ = gpkg_project(runs, "run", ski_areas=sa)
    r = proj.select("ski_area_ids", "ski_area_names").collect()[0]
    assert r.ski_area_ids is None
    assert r.ski_area_names is None


def test_mixed_property_types_roundtrip(spark, tmp_path):
    # :334 — TEXT / REAL / BOOLEAN columns survive the sqlite roundtrip
    # with their types: booleans as 0/1, numerics as REAL, nulls as NULL
    lifts = fmt.format_lifts(raw(spark, [
        ({"aerialway": "gondola", "name": "Typed",
          "aerialway:capacity": "2400", "aerialway:heating": "no"}, LINE)]))
    path = str(tmp_path / "t.gpkg")
    geopackage.write_geopackage({"lifts": lifts}, path)
    con = sqlite3.connect(path)
    r = con.execute(
        "SELECT capacity, heating, detachable, description FROM"
        " lifts_linestring").fetchone()
    assert r == (2400.0, 0, None, None)


def test_bbox_recorded_in_contents(spark, tmp_path):
    runs = fmt.format_runs(raw(spark, [
        ({"piste:type": "downhill", "name": "B"}, LINE)]))
    path = str(tmp_path / "b.gpkg")
    geopackage.write_geopackage({"runs": runs}, path)
    con = sqlite3.connect(path)
    minx, miny, maxx, maxy = con.execute(
        "SELECT min_x, min_y, max_x, max_y FROM gpkg_contents WHERE"
        " table_name='runs_linestring'").fetchone()
    assert (minx, miny, maxx, maxy) == (11.1, 47.1, 11.2, 47.2)


def test_spot_subtype_gated_columns(spark, tmp_path):
    spots = fmt.format_spots(raw(spark, [
        ({"piste:dismount": "yes", "name": "Ignored"},
         json.dumps({"type": "Point", "coordinates": [1.0, 2.0]}))]))
    path = str(tmp_path / "s.gpkg")
    geopackage.write_geopackage({"spots": spots}, path)
    con, tables = tables_of(path)
    assert tables == {"spots_point"}
    r = con.execute(
        "SELECT spot_type, dismount, name, position, entry FROM"
        " spots_point").fetchone()
    # crossing keeps dismount; lift-station-only columns null (:439-465)
    assert r == ("crossing", "yes", None, None, None)
