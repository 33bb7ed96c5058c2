"""SpotFormatter behavior suite — all 20 vectors of the reference's
SpotFormatter.unit.test.ts, run against ``format_spots`` on in-memory
DataFrames (same input contract as the e2e pipeline).

Reference: src/transforms/SpotFormatter.unit.test.ts (Crossing 4,
Lift Station 7, Avalanche Transceiver 2, Halfpipe 3, Geometry conversion 2,
Validation 2) over src/transforms/SpotFormatter.ts:30-192.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql.types import (LongType, MapType, StringType, StructField,
                               StructType)

from openskidata_processor_spark.pipeline import formatters as fmt

RAW_SCHEMA = StructType([
    StructField("osm_type", StringType()),
    StructField("osm_id", LongType()),
    StructField("tags", MapType(StringType(), StringType())),
    StructField("geometry", StringType()),
])

ORIGIN = json.dumps({"type": "Point", "coordinates": [0.0, 0.0]})


def spots(spark, tags, geometry=ORIGIN, osm_type="node"):
    df = spark.createDataFrame([(osm_type, 1, tags, geometry)], RAW_SCHEMA)
    return sorted(fmt.format_spots(df).collect(),
                  key=lambda r: r.spot_type)


def one(rows):
    assert len(rows) == 1, f"expected 1 spot, got {len(rows)}"
    return rows[0]


class TestCrossing:
    @pytest.mark.parametrize("value", ["yes", "no", "sometimes"])
    def test_formats_crossing_dismount(self, spark, value):
        r = one(spots(spark, {"piste:dismount": value}))
        assert r.spot_type == "crossing"
        assert r.dismount == value

    def test_rejects_invalid_dismount(self, spark):
        assert spots(spark, {"piste:dismount": "invalid"}) == []


class TestLiftStation:
    def test_all_properties(self, spark):
        r = one(spots(spark, {"aerialway": "station", "name": "Top Station",
                              "aerialway:station": "top",
                              "aerialway:access": "both"}))
        assert r.spot_type == "lift_station"
        assert r.name == "Top Station"
        assert r.position == "top"
        assert r.entry is True
        assert r.exit is True

    def test_only_name(self, spark):
        r = one(spots(spark, {"aerialway": "station",
                              "name": "Middle Station"}))
        assert r.spot_type == "lift_station"
        assert r.name == "Middle Station"
        assert r.position is None
        assert r.entry is None
        assert r.exit is None

    @pytest.mark.parametrize("access,entry,exit_", [
        ("entry", True, False),
        ("exit", False, True),
        ("no", False, False),
    ])
    def test_access_parsing(self, spark, access, entry, exit_):
        r = one(spots(spark, {"aerialway": "station",
                              "aerialway:access": access}))
        assert r.spot_type == "lift_station"
        assert r.entry is entry
        assert r.exit is exit_

    @pytest.mark.parametrize("position", ["bottom", "mid"])
    def test_station_position(self, spark, position):
        r = one(spots(spark, {"aerialway": "station",
                              "aerialway:station": position}))
        assert r.spot_type == "lift_station"
        assert r.position == position

    def test_lift_id_placeholder_empty(self, spark):
        # SpotFormatter.ts:137 — liftId starts "" and is filled by the
        # station association pass, not the formatter
        r = one(spots(spark, {"aerialway": "station"}))
        assert r.lift_id == ""


class TestAvalancheTransceiver:
    def test_training(self, spark):
        r = one(spots(spark, {"amenity": "avalanche_transceiver",
                              "avalanche_transceiver": "training"}))
        assert r.spot_type == "avalanche_transceiver_training"

    def test_checkpoint(self, spark):
        r = one(spots(spark, {"amenity": "avalanche_transceiver",
                              "avalanche_transceiver": "checkpoint"}))
        assert r.spot_type == "avalanche_transceiver_checkpoint"


class TestHalfpipe:
    def test_from_node(self, spark):
        r = one(spots(spark, {"man_made": "piste:halfpipe"}))
        assert r.spot_type == "halfpipe"
        assert json.loads(r.geometry)["type"] == "Point"

    def test_from_way(self, spark):
        line = json.dumps({"type": "LineString",
                           "coordinates": [[0, 0], [1, 1]]})
        r = one(spots(spark, {"man_made": "piste:halfpipe"}, line, "way"))
        assert r.spot_type == "halfpipe"
        g = json.loads(r.geometry)
        assert g["type"] == "Point"
        assert g["coordinates"] == [0.5, 0.5]

    def test_from_area(self, spark):
        poly = json.dumps({"type": "Polygon", "coordinates": [
            [[0, 0], [1, 0], [1, 1], [0, 1], [0, 0]]]})
        r = one(spots(spark, {"man_made": "piste:halfpipe"}, poly, "way"))
        assert r.spot_type == "halfpipe"
        g = json.loads(r.geometry)
        assert g["type"] == "Point"
        # turf.centroid excludes the ring's closing vertex → exact square
        # centre (GeoTransforms.unit.test.ts pins the same square at 0.5)
        assert g["coordinates"] == [0.5, 0.5]


class TestGeometryConversion:
    def test_point_unchanged(self, spark):
        pt = json.dumps({"type": "Point", "coordinates": [10.0, 20.0]})
        r = one(spots(spark, {"aerialway": "station"}, pt))
        g = json.loads(r.geometry)
        assert g["type"] == "Point"
        assert g["coordinates"] == [10.0, 20.0]

    def test_non_point_to_centroid(self, spark):
        line = json.dumps({"type": "LineString", "coordinates": [
            [0, 0], [1, 0], [1, 1], [0, 1], [0, 0]]})
        r = one(spots(spark, {"aerialway": "station"}, line, "way"))
        g = json.loads(r.geometry)
        assert g["type"] == "Point"
        # LineStrings keep every vertex incl. the duplicate closing one —
        # turf's wrap-coord exclusion applies only to polygon rings
        assert g["coordinates"] == [0.4, 0.4]


class TestValidation:
    def test_rejects_non_spot_tags(self, spark):
        assert spots(spark, {"highway": "crossing"}) == []

    def test_multiple_spot_types_emit_multiple_spots(self, spark):
        rows = spots(spark, {"piste:dismount": "yes", "aerialway": "station"})
        assert [r.spot_type for r in rows] == ["crossing", "lift_station"]

    def test_sources_carry_osm_id(self, spark):
        r = one(spots(spark, {"man_made": "piste:halfpipe"}))
        assert [s.asDict() for s in r.sources] == [
            {"type": "openstreetmap", "id": "node/1"}]
