"""P10 Mapbox projection behaviors — the reference's 20 MapboxGLFormatter
unit vectors (MapboxGLFormatter.unit.test.ts:12-460) re-expressed against
the DataFrame projectors in ``pipeline/mapbox.py``.  The golden hashes pin
outcomes end-to-end; this suite documents WHICH semantics hold per case.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from openskidata_processor_spark.pipeline.mapbox import (
    mapbox_lifts, mapbox_runs, mapbox_ski_areas, mapbox_spots)

RUN_SCHEMA = (
    "id string, name string, ref string, difficulty string,"
    " difficulty_convention string, oneway boolean, lit boolean,"
    " gladed boolean, patrolled boolean, grooming string,"
    " snowmaking boolean, snowfarming boolean, tunnel boolean,"
    " ski_areas array<string>, uses array<string>, geometry string")

LINE = json.dumps({"type": "LineString",
                   "coordinates": [[0.0, 0.0], [1.0, 1.0]]})
POINT = json.dumps({"type": "Point", "coordinates": [1.0, 1.0]})


def _runs_df(spark, **over):
    row = dict(id="1", name="Run", ref=None, difficulty=None,
               difficulty_convention="europe", oneway=None, lit=None,
               gladed=None, patrolled=None, grooming=None, snowmaking=None,
               snowfarming=None, tunnel=None, ski_areas=[],
               uses=["downhill"], geometry=LINE)
    row.update(over)
    return spark.createDataFrame(
        [(row["id"], row["name"], row["ref"], row["difficulty"],
          row["difficulty_convention"], row["oneway"], row["lit"],
          row["gladed"], row["patrolled"], row["grooming"],
          row["snowmaking"], row["snowfarming"], row["tunnel"],
          row["ski_areas"], row["uses"], row["geometry"])], RUN_SCHEMA)


LIFT_SCHEMA = ("id string, name string, ref string, status string,"
               " access string, lift_type string, tunnel boolean,"
               " ski_areas array<string>, geometry string")


def _lifts_df(spark, **over):
    row = dict(id="1", name="Lift", ref=None, status="operating",
               access=None, lift_type="chair_lift", tunnel=None,
               ski_areas=[], geometry=LINE)
    row.update(over)
    return spark.createDataFrame(
        [(row["id"], row["name"], row["ref"], row["status"], row["access"],
          row["lift_type"], row["tunnel"], row["ski_areas"],
          row["geometry"])], LIFT_SCHEMA)


SA_SCHEMA = ("id string, name string, status string,"
             " activities array<string>, geometry string")
SA_STATS_SCHEMA = SA_SCHEMA + (
    ", statistics struct<"
    "runs: struct<by_activity: map<string, map<string,"
    " struct<length_in_km: double>>>>,"
    " max_elevation: double, min_elevation: double>")


# -- runs -------------------------------------------------------------------

def test_run_name_includes_ref(spark):
    out = mapbox_runs(_runs_df(spark, ref="99")).first()
    assert out["name"] == "99 - Run"


def test_run_name_without_ref(spark):
    assert mapbox_runs(_runs_df(spark)).first()["name"] == "Run"


def test_run_multiple_uses_offsets(spark):
    # downhill + hike + sled → mapped {downhill, other}: downhill at -0.5,
    # other at +0.5, nordic absent (MapboxGLFormatter.ts:104-121)
    out = mapbox_runs(_runs_df(
        spark, uses=["downhill", "hike", "sled"])).first()
    assert out["downhill"] == -0.5
    assert out["other"] == 0.5
    assert out["nordic"] is None and out["skitour"] is None


def test_run_ski_area_ids_pass_through(spark):
    out = mapbox_runs(_runs_df(spark, ski_areas=["2"])).first()
    assert out["skiAreas"] == ["2"]


def test_connection_only_run_dropped(spark):
    assert mapbox_runs(_runs_df(spark, uses=["connection"])).count() == 0


# -- lifts ------------------------------------------------------------------

def test_lift_name_and_type_with_ref(spark):
    out = mapbox_lifts(_lifts_df(spark, ref="99")).first()
    assert out["name_and_type"] == "99 - Lift (Chairlift)"


def test_lift_name_and_type_without_ref(spark):
    out = mapbox_lifts(_lifts_df(spark)).first()
    assert out["name_and_type"] == "Lift (Chairlift)"


def test_lift_ski_area_ids_pass_through(spark):
    out = mapbox_lifts(_lifts_df(spark, ski_areas=["2"],
                                 lift_type="cable_car")).first()
    assert out["skiAreas"] == ["2"]
    assert out["name_and_type"] == "Lift (Cable Car)"


def test_lift_operating_color_vs_default(spark):
    op = mapbox_lifts(_lifts_df(spark)).first()["color"]
    closed = mapbox_lifts(_lifts_df(spark, status="abandoned")) \
        .first()["color"]
    assert op == "hsl(0, 82%, 42%)"      # snapshot-verified constant
    assert closed == "hsl(0, 0%, 55%)"   # non-operating default
    assert op != closed


# -- ski areas --------------------------------------------------------------

def _sa_df(spark, geometry, statistics=None, activities=("downhill",)):
    if statistics is None:
        return spark.createDataFrame(
            [("ID", "Name", "operating", list(activities), geometry)],
            SA_SCHEMA)
    return spark.createDataFrame(
        [("ID", "Name", "operating", list(activities), geometry,
          statistics)], SA_STATS_SCHEMA)


def test_basic_ski_area_without_statistics(spark):
    out = mapbox_ski_areas(_sa_df(spark, POINT)).first()
    assert out["name"] == "Name" and out["status"] == "operating"
    assert out["has_downhill"] is True and out["has_nordic"] is False
    assert out["downhillDistance"] is None and out["nordicDistance"] is None
    assert out["maxElevation"] is None and out["vertical"] is None


def test_ski_area_run_distances_rounded(spark):
    stats = {"runs": {"by_activity": {
        "downhill": {"advanced": (10.12312,), "other": (5.7,)},
        "nordic": {"easy": (1.0,)}}},
        "max_elevation": 0.0, "min_elevation": 0.0}
    out = mapbox_ski_areas(_sa_df(spark, POINT, stats)).first()
    assert out["downhillDistance"] == 16   # round(15.82312)
    assert out["nordicDistance"] == 1


def test_ski_area_elevation_rounding(spark):
    stats = {"runs": {"by_activity": {}},
             "max_elevation": 1023.2323, "min_elevation": 100.82}
    out = mapbox_ski_areas(_sa_df(spark, POINT, stats)).first()
    assert out["maxElevation"] == 1023
    assert out["vertical"] == 922          # round(922.4123)


def test_polygon_ski_area_exports_as_point(spark):
    poly = json.dumps({"type": "Polygon", "coordinates": [
        [[0.0, 0.0], [0.0, 1.0], [1.0, 1.0], [0.0, 0.0]]]})
    g = json.loads(mapbox_ski_areas(_sa_df(spark, poly)).first()["geometry"])
    assert g["type"] == "Point"


def test_multipolygon_ski_area_exports_as_multipoint(spark):
    mp = json.dumps({"type": "MultiPolygon", "coordinates": [
        [[[0.0, 0.0], [0.0, 1.0], [1.0, 1.0], [0.0, 0.0]]],
        [[[2.0, 2.0], [2.0, 3.0], [3.0, 3.0], [2.0, 2.0]]]]})
    g = json.loads(mapbox_ski_areas(_sa_df(spark, mp)).first()["geometry"])
    # GeoTransforms.ts:73-81: one interior point PER member polygon
    assert g["type"] == "MultiPoint"
    assert len(g["coordinates"]) == 2
    from openskidata_processor_spark.functions.geometry import point_in_geom
    mp_geom = json.loads(mp)
    for p in g["coordinates"]:
        assert point_in_geom(p[0], p[1], mp_geom)


def test_line_ski_area_geometry_passes_through(spark):
    g = json.loads(mapbox_ski_areas(_sa_df(spark, POINT)).first()["geometry"])
    assert g == {"type": "Point", "coordinates": [1.0, 1.0]}


# -- spots ------------------------------------------------------------------

SPOT_SCHEMA = ("id string, spot_type string, name string, position string,"
               " entry boolean, exit boolean, dismount boolean,"
               " associated_lift_id string, ski_areas array<string>,"
               " geometry string")


def _spot_df(spark, **over):
    row = dict(id="spot1", spot_type="lift_station", name="Lower Station",
               position=None, entry=None, exit=None, dismount=None,
               associated_lift_id="", ski_areas=["ski-area-1"],
               geometry=json.dumps({"type": "Point",
                                    "coordinates": [10.0, 20.0]}))
    row.update(over)
    return spark.createDataFrame(
        [(row["id"], row["spot_type"], row["name"], row["position"],
          row["entry"], row["exit"], row["dismount"],
          row["associated_lift_id"], row["ski_areas"], row["geometry"])],
        SPOT_SCHEMA)


def test_lift_station_spot_full(spark):
    out = mapbox_spots(_spot_df(spark)).first()
    assert (out["id"], out["spotType"]) == ("spot1", "lift_station")
    assert out["name"] == "Lower Station"
    assert out["skiAreas"] == ["ski-area-1"]
    assert json.loads(out["geometry"])["coordinates"] == [10.0, 20.0]


def test_lift_station_spot_null_name(spark):
    out = mapbox_spots(_spot_df(spark, name=None)).first()
    assert out["name"] is None and out["spotType"] == "lift_station"


def test_crossing_spot_masks_station_fields(spark):
    out = mapbox_spots(_spot_df(
        spark, spot_type="crossing", dismount=True)).first()
    assert out["spotType"] == "crossing" and out["dismount"] is True
    # station-only properties are nulled for non-station spots
    assert out["name"] is None and out["position"] is None
    assert out["entry"] is None and out["exit"] is None


@pytest.mark.parametrize("stype", [
    "halfpipe", "avalanche_transceiver_training",
    "avalanche_transceiver_checkpoint"])
def test_minimal_spot_types_export(spark, stype):
    out = mapbox_spots(_spot_df(spark, spot_type=stype,
                                ski_areas=[])).first()
    assert out["spotType"] == stype and out["skiAreas"] == []
    assert out["dismount"] is None and out["name"] is None


def test_spot_geometry_preserved(spark):
    g = json.dumps({"type": "Point", "coordinates": [5.0, 15.0]})
    out = mapbox_spots(_spot_df(spark, geometry=g)).first()
    assert json.loads(out["geometry"]) == json.loads(g)
