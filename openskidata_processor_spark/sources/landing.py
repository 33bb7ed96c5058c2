"""Landing-directory readers: the bridge from ``download_all``'s raw
files to the prepare pipeline's DataFrames.

The reference streams each downloaded file through osmtogeojson per layer
(src/io/GeoJSONDownloader.ts); this engine reads ALL Overpass dumps into
one ``elements`` DataFrame (deduplicated by (type, id) — the five layer
queries share nodes/ways) and routes per layer inside
``prepare_from_elements``, so assembly runs once over the union.

Scale note: Overpass ``.osmjson`` is one JSON object per file, so each
file is a single input split (``multiLine``) — fine for the per-layer
dumps this pipeline lands.  A 100 TB deployment would land elements as
JSONL/parquet instead (``spark.read.schema(ELEMENTS_SCHEMA).json`` on
line-delimited files splits normally); the schema below is the contract
either way.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ELEMENTS_SCHEMA = (
    "type string, id long, lat double, lon double, nodes array<long>, "
    "members array<struct<type:string, ref:long, role:string>>, "
    "tags map<string,string>")

_WRAPPER_SCHEMA = (
    "elements array<struct<"
    "type: string, id: long, lat: double, lon: double, "
    "nodes: array<long>, "
    "members: array<struct<type: string, ref: long, role: string>>, "
    "tags: map<string, string>>>")

SKIMAP_SCHEMA = ("id string, name string, status string, "
                 "activities array<string>, scalerank int, "
                 "official_website string, geometry string")


def read_osm_elements(spark: SparkSession, landing_dir: str) -> DataFrame:
    """``input_*.osmjson`` Overpass dumps → one elements DataFrame.

    Elements appearing in several layer dumps (shared nodes/ways) are
    deduplicated on (type, id) — duplicates would multiply coordinates in
    the way-assembly join."""
    paths = sorted(glob.glob(os.path.join(landing_dir, "input_*.osmjson")))
    if not paths:
        raise FileNotFoundError(
            f"no input_*.osmjson files in {landing_dir!r} — run download")
    wrapper = (spark.read.option("multiLine", "true")
               .schema(_WRAPPER_SCHEMA).json(paths))
    return (wrapper.select(F.explode("elements").alias("e"))
            .select("e.type", "e.id", "e.lat", "e.lon", "e.nodes",
                    "e.members", "e.tags")
            .dropDuplicates(["type", "id"]))


def read_skimap_areas(spark: SparkSession, path: str) -> DataFrame:
    """``input_skimap_ski_areas.geojson`` → the Skimap.org layer frame
    (SkiAreaFormatter's Skimap input contract).  Missing file → empty
    frame (the pipeline runs OSM-only, like the reference with an empty
    download)."""
    if not os.path.exists(path):
        return spark.createDataFrame([], SKIMAP_SCHEMA)
    fc_schema = (
        "features array<struct<"
        "properties: struct<id: string, name: string, status: string, "
        "activities: array<string>, scalerank: int, "
        "official_website: string>, "
        "geometry: struct<coordinates: array<double>, type: string>>>")
    fc = spark.read.option("multiLine", "true").schema(fc_schema).json(path)
    f = F.col("f")
    return (fc.select(F.explode("features").alias("f"))
            .select(
                f["properties"]["id"].alias("id"),
                f["properties"]["name"].alias("name"),
                f["properties"]["status"].alias("status"),
                f["properties"]["activities"].alias("activities"),
                f["properties"]["scalerank"].alias("scalerank"),
                f["properties"]["official_website"].alias("official_website"),
                # canonical compact JSON, sort_keys order (coordinates
                # before type) so content-hash ids match the engine's form
                F.to_json(F.struct(
                    f["geometry"]["coordinates"].alias("coordinates"),
                    f["geometry"]["type"].alias("type"))).alias("geometry")))
