"""OSM element assembly (S3/J11) tests."""

from __future__ import annotations

import json

import pytest

from openskidata_processor_spark.sources.osm import (assemble_osm_features,
                                                     site_relations)

SCHEMA = ("type string, id long, lat double, lon double, nodes array<long>, "
          "members array<struct<type:string, ref:long, role:string>>, "
          "tags map<string,string>")


def node(i, lon, lat, tags=None):
    return ("node", i, lat, lon, None, None, tags or {})


def way(i, refs, tags):
    return ("way", i, None, None, refs, None, tags)


def rel(i, members, tags):
    return ("relation", i, None, None, None, members, tags)


@pytest.fixture(scope="module")
def assembled(spark):
    elements = spark.createDataFrame([
        node(1, 11.0, 47.0), node(2, 11.1, 47.0), node(3, 11.1, 47.1),
        node(4, 11.0, 47.1),
        node(10, 11.05, 47.05, {"aerialway": "station"}),
        # open way → LineString
        way(100, [1, 2, 3], {"piste:type": "nordic"}),
        # closed way + landuse → Polygon
        way(101, [1, 2, 3, 4, 1], {"landuse": "winter_sports"}),
        # closed way, downhill piste → Polygon (included_values rule)
        way(102, [1, 2, 3, 1], {"piste:type": "downhill"}),
        # closed way, non-area tag → stays LineString
        way(103, [1, 2, 3, 1], {"piste:type": "nordic"}),
        # multipolygon relation from two open ways forming a ring
        way(104, [1, 2, 3], {}),
        way(105, [3, 4, 1], {}),
        rel(200, [{"type": "way", "ref": 104, "role": "outer"},
                  {"type": "way", "ref": 105, "role": "outer"}],
            {"type": "multipolygon", "landuse": "winter_sports"}),
        rel(201, [{"type": "way", "ref": 100, "role": ""},
                  {"type": "node", "ref": 10, "role": ""}],
            {"site": "piste", "name": "Site"}),
    ], SCHEMA)
    feats = {(r.osm_type, r.osm_id): r
             for r in assemble_osm_features(elements).collect()}
    sites = site_relations(elements).collect()
    return feats, sites


def test_tagged_node_becomes_point(assembled):
    feats, _ = assembled
    g = json.loads(feats[("node", 10)].geometry)
    assert g == {"coordinates": [11.05, 47.05], "type": "Point"}
    assert ("node", 1) not in feats  # untagged nodes are not features


def test_open_way_linestring(assembled):
    feats, _ = assembled
    g = json.loads(feats[("way", 100)].geometry)
    assert g["type"] == "LineString"
    assert g["coordinates"] == [[11.0, 47.0], [11.1, 47.0], [11.1, 47.1]]


def test_closed_area_way_polygon(assembled):
    feats, _ = assembled
    assert json.loads(feats[("way", 101)].geometry)["type"] == "Polygon"
    assert json.loads(feats[("way", 102)].geometry)["type"] == "Polygon"


def test_closed_non_area_way_stays_line(assembled):
    feats, _ = assembled
    assert json.loads(feats[("way", 103)].geometry)["type"] == "LineString"


def test_multipolygon_relation_ring_stitching(assembled):
    feats, _ = assembled
    g = json.loads(feats[("relation", 200)].geometry)
    assert g["type"] == "Polygon"
    ring = g["coordinates"][0]
    assert ring[0] == ring[-1]
    assert len(ring) == 5


def test_two_ring_relation_with_tagged_members(spark):
    """OSMToGeoJSONConverter.unit.test.ts:4-302 — a multipolygon relation
    whose members are two open stitching ways plus a closed tagged way:
    the relation resolves to a MultiPolygon with BOTH rings, and member
    ways with their own tags remain standalone features."""
    elements = spark.createDataFrame([
        node(1, 0.0, 0.0), node(2, 0.0, 1.0), node(3, 1.0, 1.0),
        node(4, 2.0, 2.0), node(5, 2.0, 3.0), node(6, 3.0, 3.0),
        way(1001, [1, 2], {"natural": "wood"}),
        way(1002, [2, 3, 1], {"natural": "wood"}),
        way(1003, [4, 5, 6, 4], {"natural": "wood",
                                 "landuse": "winter_sports"}),
        rel(10001, [{"type": "way", "ref": 1001, "role": "outer"},
                    {"type": "way", "ref": 1002, "role": "outer"},
                    {"type": "way", "ref": 1003, "role": "outer"}],
            {"type": "multipolygon", "landuse": "winter_sports"}),
    ], SCHEMA)
    feats = {(r.osm_type, r.osm_id): r
             for r in assemble_osm_features(elements).collect()}

    g = json.loads(feats[("relation", 10001)].geometry)
    assert g["type"] == "MultiPolygon"
    assert len(g["coordinates"]) == 2
    rings = sorted((len(poly[0]) for poly in g["coordinates"]))
    assert rings == [4, 4]  # triangle rings, each closed
    for poly in g["coordinates"]:
        assert poly[0][0] == poly[0][-1]

    # tagged member ways stay standalone: the closed area way as Polygon,
    # the open ways as LineStrings
    assert json.loads(feats[("way", 1003)].geometry)["type"] == "Polygon"
    assert json.loads(feats[("way", 1001)].geometry)["type"] == "LineString"
    assert json.loads(feats[("way", 1002)].geometry)["type"] == "LineString"


def test_site_relations_shape(assembled):
    _, sites = assembled
    assert len(sites) == 1
    s = sites[0]
    assert s.site_id == 201
    assert [m.ref for m in s.members] == [100, 10]


def test_overpass_query_builder():
    from openskidata_processor_spark.sources.download import overpass_query
    q = overpass_query("runs", bbox=(46.0, 10.0, 48.0, 12.0))
    assert '[timeout:1800]' in q
    assert '[bbox:46.0,10.0,48.0,12.0]' in q  # global setting, s,w,n,e
    assert 'piste:type' in q
    planet = overpass_query("ski_area_sites")
    assert '"site"="piste"' in planet
    assert '[bbox:' not in planet


def test_overpass_query_contract():
    """The selections mirror DownloadURLs.ts: site-member railways only,
    lifecycle-prefixed keys, nw spot variants, transceiver value filter."""
    from openskidata_processor_spark.sources.download import overpass_query
    lifts = overpass_query("lifts")
    assert 'way(r)["railway"]' in lifts          # only site=piste members
    assert 'rel["site"="piste"]' in lifts
    for p in ("disused", "abandoned", "proposed", "planned", "construction"):
        assert f'way["{p}:aerialway"]' in lifts
    assert '"railway"="funicular"' in lifts
    areas = overpass_query("ski_areas")
    for p in ("disused", "abandoned", "proposed", "planned", "construction"):
        assert f'wr["{p}:landuse"="winter_sports"]' in areas
    spots = overpass_query("spots")
    assert 'nw["aerialway"="station"]' in spots
    assert '["avalanche_transceiver"="training"]' in spots
    assert '["avalanche_transceiver"="checkpoint"]' in spots
    assert 'nw["man_made"="piste:halfpipe"]' in spots
