"""S3/J11 — OSM element assembly as DataFrame joins
(src/io/OSMToGeoJSONConverter.ts:91-135, polygon rules :5-89; the library
work it delegates to osmtogeojson re-expressed Spark-first).

The reference converts Overpass element JSON to GeoJSON in-process; that
conversion is fundamentally two equi-joins (SURVEY.md J11):

    way.node_refs  ⋈  nodes        (positions, ordered by ref index)
    relation.members ⋈  ways       (ring assembly for multipolygons)

Both are expressed here as explode → join → sorted collect — at planet
scale they shuffle on element ids (the natural key) and nothing touches
the driver.  Coordinates round to 1e-12 like the reference reader
(:119-126); polygon detection applies the reference's tag table to closed
ways.

Input schema (one row per element, as read from Overpass JSON with
``spark.read.json``): type string, id long, lat double, lon double,
nodes array<long>, members array<struct<type,ref,role>>,
tags map<string,string>.
"""

from __future__ import annotations

import json

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

# The reference's polygon-detection table (OSMToGeoJSONConverter.ts:5-89):
# closed ways with these tags are areas.  True = any value (except "no");
# (key, {...}) = include/exclude specific values.
POLYGON_KEYS_ANY = (
    "building", "landuse", "amenity", "leisure", "area", "boundary",
    "place", "shop", "tourism", "historic", "public_transport", "office",
    "building:part", "military", "ruins", "area:highway", "craft",
)
POLYGON_INCLUDED = {
    "highway": ("services", "rest_area", "escape"),
    "waterway": ("riverbank", "dock", "boatyard", "dam"),
    "barrier": ("city_wall", "ditch", "hedge", "retaining_wall", "wall",
                "spikes"),
    "railway": ("station", "turntable", "roundhouse", "platform"),
    "power": ("generator", "station", "sub_station", "transformer"),
    "piste:type": ("downhill",),
}
POLYGON_EXCLUDED = {
    "natural": ("coastline", "ridge", "arete", "tree_row"),
    "man_made": ("cutline", "embankment", "pipeline"),
    "aeroway": ("taxiway",),
}


def is_area_tags(tags: Column) -> Column:
    """Closed-way polygon detection per the reference's tag table."""
    t = lambda k: F.element_at(tags, k)  # noqa: E731
    expr = F.lit(False)
    for k in POLYGON_KEYS_ANY:
        expr = expr | (t(k).isNotNull() & (t(k) != "no"))
    for k, vals in POLYGON_INCLUDED.items():
        expr = expr | t(k).isin(*vals)
    for k, vals in POLYGON_EXCLUDED.items():
        expr = expr | (t(k).isNotNull() & (t(k) != "no") & ~t(k).isin(*vals))
    # area=no always wins (osmtogeojson rule)
    return F.when(t("area") == "no", F.lit(False)).otherwise(expr)


def _round12(col: Column) -> Column:
    return F.round(col, 12)


def assemble_ways(elements: DataFrame) -> DataFrame:
    """Ways → (osm_type, osm_id, tags, geometry): node-ref join + ordered
    coordinate collect; closed ways with area tags become Polygons."""
    nodes = (elements.filter(F.col("type") == "node")
             .select(F.col("id").alias("__nid"),
                     _round12("lon").alias("__lon"),
                     _round12("lat").alias("__lat")))
    way_nodes = (elements.filter(F.col("type") == "way")
                 .select("id", "tags",
                         F.posexplode("nodes").alias("__pos", "__ref")))
    joined = way_nodes.join(nodes, way_nodes["__ref"] == nodes["__nid"])
    coords = (joined.groupBy("id")
              .agg(F.first("tags").alias("tags"),
                   F.transform(
                       F.array_sort(F.collect_list(
                           F.struct("__pos", "__lon", "__lat"))),
                       lambda s: F.array(s["__lon"], s["__lat"]))
                   .alias("coords")))

    closed = (F.size("coords") >= 4) & \
        (F.col("coords")[0] == F.element_at("coords", -1))
    as_polygon = closed & is_area_tags(F.col("tags"))

    @F.pandas_udf(StringType())
    def geom_json(coords_col: pd.Series, poly: pd.Series) -> pd.Series:
        out = []
        for cs, p in zip(coords_col, poly):
            cl = [list(c) for c in cs]
            g = ({"type": "Polygon", "coordinates": [cl]} if p
                 else {"type": "LineString", "coordinates": cl})
            out.append(json.dumps(g, separators=(",", ":"), sort_keys=True))
        return pd.Series(out)

    return (coords.filter(F.size("coords") >= 2)
            .select(F.lit("way").alias("osm_type"),
                    F.col("id").alias("osm_id"), F.col("tags"),
                    geom_json(F.col("coords"), as_polygon).alias("geometry")))


def assemble_points(elements: DataFrame) -> DataFrame:
    """Tagged nodes → Point features."""
    return (elements.filter((F.col("type") == "node")
                            & F.col("tags").isNotNull()
                            & (F.size(F.map_keys("tags")) > 0))
            .select(F.lit("node").alias("osm_type"),
                    F.col("id").alias("osm_id"), F.col("tags"),
                    F.concat(F.lit('{"coordinates":['),
                             _round12("lon"), F.lit(","), _round12("lat"),
                             F.lit('],"type":"Point"}')).alias("geometry")))


def assemble_multipolygons(elements: DataFrame,
                           ways: DataFrame) -> DataFrame:
    """type=multipolygon relations → (Multi)Polygon via member-way ring
    join.  Rings stitch open member ways end-to-end (grouped per relation
    — relations are small); inner rings attach to the outer ring that
    contains their first point.  This covers the multipolygon subset the
    pipeline consumes (ski-area landuse relations)."""
    rels = (elements.filter((F.col("type") == "relation")
                            & (F.element_at("tags", "type") == "multipolygon"))
            .select(F.col("id").alias("rel_id"), "tags",
                    F.explode("members").alias("m"))
            .filter(F.col("m.type") == "way")
            .select("rel_id", "tags", F.col("m.ref").alias("way_ref"),
                    F.coalesce(F.col("m.role"), F.lit("outer")).alias("role")))
    member_ways = ways.select(F.col("osm_id").alias("way_ref"),
                              F.col("geometry").alias("way_geom"))
    joined = (rels.join(member_ways, "way_ref")
              .groupBy("rel_id")
              .agg(F.first("tags").alias("tags"),
                   F.collect_list(F.struct("role", "way_geom"))
                   .alias("members")))

    @F.pandas_udf(StringType())
    def build(members_col: pd.Series) -> pd.Series:
        from ..functions.geometry import point_in_ring

        def rings_from(ways_list):
            segs = []
            for w in ways_list:
                g = json.loads(w)
                cs = g["coordinates"]
                if g["type"] == "Polygon":
                    cs = cs[0]
                segs.append([list(c) for c in cs])
            rings, open_segs = [], []
            for s in segs:
                (rings if s[0] == s[-1] else open_segs).append(s)
            # stitch open segments end-to-end
            while open_segs:
                cur = open_segs.pop(0)
                changed = True
                while changed and cur[0] != cur[-1]:
                    changed = False
                    for i, s in enumerate(open_segs):
                        if s[0] == cur[-1]:
                            cur += s[1:]
                        elif s[-1] == cur[-1]:
                            cur += s[-2::-1]
                        elif s[-1] == cur[0]:
                            cur = s[:-1] + cur
                        elif s[0] == cur[0]:
                            cur = s[::-1][:-1] + cur
                        else:
                            continue
                        open_segs.pop(i)
                        changed = True
                        break
                if cur[0] == cur[-1] and len(cur) >= 4:
                    rings.append(cur)
            return rings

        out = []
        for members in members_col:
            outers = rings_from([m["way_geom"] for m in members
                                 if m["role"] != "inner"])
            inners = rings_from([m["way_geom"] for m in members
                                 if m["role"] == "inner"])
            polys = [[o] for o in outers]
            for i_ring in inners:
                px, py = i_ring[0][0], i_ring[0][1]
                for poly in polys:
                    if point_in_ring(px, py, poly[0]):
                        poly.append(i_ring)
                        break
            if not polys:
                out.append(None)
            elif len(polys) == 1:
                out.append(json.dumps(
                    {"type": "Polygon", "coordinates": polys[0]},
                    separators=(",", ":"), sort_keys=True))
            else:
                out.append(json.dumps(
                    {"type": "MultiPolygon", "coordinates": polys},
                    separators=(",", ":"), sort_keys=True))
        return pd.Series(out)

    return (joined.select(F.lit("relation").alias("osm_type"),
                          F.col("rel_id").alias("osm_id"), F.col("tags"),
                          build(F.col("members")).alias("geometry"))
            .filter(F.col("geometry").isNotNull()))


def assemble_osm_features(elements: DataFrame) -> DataFrame:
    """Full S3 conversion: tagged nodes + ways + multipolygon relations →
    (osm_type, osm_id, tags, geometry) bronze feature rows."""
    ways = assemble_ways(elements)
    return (assemble_points(elements)
            .unionByName(ways)
            .unionByName(assemble_multipolygons(elements, ways)))


def site_relations(elements: DataFrame) -> DataFrame:
    """S5: ``site=piste`` relations in the shape the J1 membership join
    consumes (site_id, tags, members)."""
    return (elements.filter((F.col("type") == "relation")
                            & (F.element_at("tags", "site") == "piste"))
            .select(F.col("id").alias("site_id"), "tags",
                    F.transform("members", lambda m: F.struct(
                        m["type"].alias("type"), m["ref"].alias("ref"),
                        m["role"].alias("role"))).alias("members")))
