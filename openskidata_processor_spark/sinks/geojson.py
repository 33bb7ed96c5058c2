"""K1 — GeoJSON FeatureCollection sink (src/transforms/FeatureCollection.ts).

Features serialize as one JSON object per row (Catalyst ``to_json`` — no
Python in the per-row path), ordered by id for byte-reproducible output
(O1, PostgreSQLClusteringDatabase.ts:551).  Two shapes:

- ``write_feature_collection``: the reference's single-file
  ``{"type": "FeatureCollection", "features": [...]}`` — collectable
  because it is an *export* format; the driver streams partitions.
- ``write_feature_jsonl``: the scale shape — sharded JSON-lines of
  Feature objects (one spark text write, no driver bottleneck); the K5
  merge of N such directories is a plain ``unionByName``.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def feature_json(df: DataFrame, geometry_col: str = "geometry",
                 id_col: str = "id") -> DataFrame:
    """One canonical GeoJSON Feature string per row (column ``feature``),
    plus the id for ordering."""
    prop_cols = [c for c in df.columns if c not in (geometry_col,)]
    # the reference serializes null properties explicitly
    # ("access": null, "bearing": null, ... in every snapshot)
    props = F.to_json(F.struct(*[F.col(c) for c in prop_cols]),
                      {"ignoreNullFields": "false"})
    feature = F.concat(
        F.lit('{"type":"Feature","properties":'), props,
        F.lit(',"geometry":'), F.col(geometry_col), F.lit("}"))
    return df.select(F.col(id_col).alias("__id"), feature.alias("feature"))


def write_feature_jsonl(df: DataFrame, path: str,
                        geometry_col: str = "geometry") -> None:
    """Sharded newline-delimited Features (the 100 TB shape)."""
    feature_json(df, geometry_col).select("feature").write.mode(
        "overwrite").text(path)


def write_feature_collection(df: DataFrame, path: str,
                             geometry_col: str = "geometry") -> None:
    """Single FeatureCollection file, id-ordered (reference parity)."""
    # toLocalIterator keeps driver memory bounded to one partition at a
    # time (single-file FC output at any layer size); prefetchPartitions
    # overlaps the next partition's fetch job with driver-side writing.
    rows = (feature_json(df, geometry_col)
            .orderBy("__id")
            .select("feature")
            .toLocalIterator(prefetchPartitions=True))
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        f.write('{"type":"FeatureCollection","features":[')
        for i, r in enumerate(rows):
            if i:
                f.write(",")
            f.write(r.feature)
        f.write("]}")


def read_feature_jsonl(spark, path: str) -> DataFrame:
    """The scale reader (inverse of ``write_feature_jsonl``): sharded
    newline-delimited Features → one ``feature`` string row each.  A plain
    splittable text scan — N files / N splits, no driver involvement."""
    return (spark.read.text(path)
            .select(F.col("value").alias("feature"))
            .filter(F.length("feature") > 0))


# Above this size a single FeatureCollection file parses executor-side.
DRIVER_READ_MAX_BYTES = 32 << 20


def read_feature_collection(spark, path: str,
                            max_driver_bytes: int = DRIVER_READ_MAX_BYTES
                            ) -> DataFrame:
    """Reader for FeatureCollection inputs (S4): features land as JSON
    strings, one row each.

    Three paths by input shape:
    - a *directory* → sharded JSONL (``read_feature_jsonl``) — the
      documented 100 TB entry, fully splittable;
    - a small single file (≤ ``max_driver_bytes``) → driver ``json.load``
      with canonical re-serialization (byte-stable parity ingest);
    - a large single file → ``spark.read.json(multiLine)`` with the
      EXPLICIT schema ``features array<string>`` + ``explode``: Spark's
      Jackson parser returns the raw JSON text of each feature when the
      expected type is string, so features pass through verbatim — no
      schema inference, no cross-feature type coercion (Point vs Polygon
      coordinate nesting), no null-field dropping.  One JSON document
      can't split, but the parse and feature fan-out happen on an
      executor and everything downstream is distributed — the driver
      never holds the file.
    """
    if os.path.isdir(path):
        return read_feature_jsonl(spark, path)
    if os.path.getsize(path) <= max_driver_bytes:
        with open(path) as f:
            fc = json.load(f)
        feats = [(json.dumps(x, separators=(",", ":"), sort_keys=True),)
                 for x in fc.get("features", [])]
        return spark.createDataFrame(feats or [("",)], "feature string") \
            .filter(F.col("feature") != "")
    fc = (spark.read.option("multiLine", "true")
          .schema("features array<string>").json(path))
    return fc.select(F.explode("features").alias("feature"))


# ---------------------------------------------------------------------------
# Reference-shaped export (the exact output contract of the reference's
# {runs,lifts,spots,ski_areas}.geojson files, PrepareGeoJSON.int.test.ts
# snapshots): camelCase property keys, feature_type exported as "type",
# and each member feature embedding its ski areas as SUMMARY FEATURES
# (toSkiAreaSummary.ts: Feature{properties:{id,name,activities,type,
# status}, geometry}) instead of id arrays.
# ---------------------------------------------------------------------------

_CAMEL_OVERRIDES = {
    "feature_type": "type",
    "wikidata_id": "wikidataID",
    "ref_fr_cairn": "refFRCAIRN",
    "associated_lift_id": "liftId",
}


def _camel(name: str) -> str:
    if name in _CAMEL_OVERRIDES:
        return _CAMEL_OVERRIDES[name]
    head, *rest = name.split("_")
    return head + "".join(w.capitalize() for w in rest)


def _camel_struct(col: F.Column, fields: list[str]) -> F.Column:
    return F.when(col.isNotNull(), F.struct(
        *[col[f].alias(_camel(f)) for f in fields]))


def _camel_measures(v: F.Column, fields: list[str]) -> F.Column:
    return F.struct(*[v[f].alias(_camel(f)) for f in fields])


def _camel_statistics(c: F.Column) -> F.Column:
    """Deep-camelCase the A2 statistics struct to the reference's exported
    shape (statistics.runs.byActivity.{act}.byDifficulty.{diff}.lengthInKm
    ..., statistics.lifts.byType.{type}...)."""
    run_meas = ["count", "length_in_km", "snowmaking_length_in_km",
                "snowfarming_length_in_km", "combined_elevation_change",
                "min_elevation", "max_elevation"]
    lift_meas = ["count", "length_in_km", "combined_elevation_change",
                 "min_elevation", "max_elevation"]
    runs = F.when(c["runs"].isNotNull(), F.struct(
        F.transform_values(
            c["runs"]["by_activity"],
            lambda _, v: F.struct(
                F.transform_values(
                    v, lambda _k, m: _camel_measures(m, run_meas))
                .alias("byDifficulty"))).alias("byActivity"),
        c["runs"]["min_elevation"].alias("minElevation"),
        c["runs"]["max_elevation"].alias("maxElevation")))
    lifts = F.when(c["lifts"].isNotNull(), F.struct(
        F.transform_values(c["lifts"]["by_type"],
                           lambda _, m: _camel_measures(m, lift_meas))
        .alias("byType"),
        c["lifts"]["min_elevation"].alias("minElevation"),
        c["lifts"]["max_elevation"].alias("maxElevation")))
    return F.when(c.isNotNull(), F.struct(
        runs.alias("runs"), lifts.alias("lifts"),
        c["min_elevation"].alias("minElevation"),
        c["max_elevation"].alias("maxElevation")))


def ski_area_summary_json(ski_areas: DataFrame) -> DataFrame:
    """(ski_area_id, summary feature JSON) — toSkiAreaSummary.ts."""
    ftype = (F.col("feature_type") if "feature_type" in ski_areas.columns
             else F.lit("skiArea"))
    props = F.to_json(F.struct(
        F.col("activities"), F.col("id"), F.col("name"), F.col("status"),
        ftype.alias("type")), {"ignoreNullFields": "false"})
    return ski_areas.select(
        F.col("id").alias("__said"),
        F.concat(F.lit('{"type":"Feature","properties":'), props,
                 F.lit(',"geometry":'), F.col("geometry"), F.lit("}"))
        .alias("__summary"))


def _stations_json(col: F.Column) -> F.Column:
    """Lift stations as embedded spot features (FeatureExporter.ts:95-114;
    the engine embeds the station summary it carries: id/name/position/
    entry/exit + geometry)."""
    feat = lambda s: F.concat(  # noqa: E731
        F.lit('{"type":"Feature","properties":'),
        F.to_json(F.struct(s["id"].alias("id"), s["name"].alias("name"),
                           s["position"].alias("position"),
                           s["entry"].alias("entry"),
                           s["exit"].alias("exit")),
                  {"ignoreNullFields": "false"}),
        F.lit(',"geometry":'), s["geometry"], F.lit("}"))
    return F.concat(F.lit("["),
                    F.concat_ws(",", F.transform(col, feat)), F.lit("]"))


def reference_properties(df: DataFrame, ski_areas: DataFrame | None,
                         geometry_col: str = "geometry") -> DataFrame:
    """Rewrite a layer to the reference's exported property shape: columns
    camelCased (with the published special cases), nested structs
    (viewport_hint, elevation_profile, statistics) deep-camelCased, and the
    ski_areas id array / stations array replaced by embedded features.
    Raw-JSON fragments (columns in __splices) are spliced unescaped at
    serialization time."""
    # engine-internal working columns never exported by the reference
    out = df.drop("is_polygon", "source", "n_members")
    if "feature_type" not in out.columns:
        out = out.withColumn("feature_type", F.lit("skiArea"))
    splices: dict[str, F.Column] = {}
    if "ski_areas" in df.columns and ski_areas is not None:
        summaries = ski_area_summary_json(ski_areas)
        resolved = (df.select(F.col("id").alias("__fid"),
                              F.explode("ski_areas").alias("__said"))
                    .join(F.broadcast(summaries), "__said")
                    .groupBy("__fid")
                    .agg(F.concat(F.lit("["), F.concat_ws(
                        ",", F.sort_array(F.collect_list("__summary"))),
                        F.lit("]")).alias("__ski_areas_json")))
        out = (out.join(resolved, out["id"] == resolved["__fid"], "left")
               .drop("__fid", "ski_areas"))
        splices["skiAreas"] = F.coalesce(F.col("__ski_areas_json"),
                                         F.lit("[]"))
    if "stations" in df.columns:
        splices["stations"] = F.coalesce(_stations_json(F.col("stations")),
                                         F.lit("[]"))
    cols = []
    for name in out.columns:
        if name in (geometry_col, "__ski_areas_json", "stations"):
            continue
        c = F.col(name)
        if name == "viewport_hint":
            c = _camel_struct(c, ["bearing", "center", "min_camera_y",
                                  "rotated_height_meters",
                                  "rotated_width_meters"])
        elif name == "elevation_profile":
            c = _camel_struct(c, ["heights", "resolution",
                                  "target_resolution"])
        elif name == "statistics":
            c = _camel_statistics(c)
        cols.append(c.alias(_camel(name)))
    for key, frag in splices.items():
        cols.append(frag.alias(f"__splice_{key}"))
    return out.select(F.col(geometry_col), *cols)


def reference_feature_json(df: DataFrame, ski_areas: DataFrame | None,
                           geometry_col: str = "geometry") -> DataFrame:
    """One reference-contract GeoJSON Feature string per row."""
    shaped = reference_properties(df, ski_areas, geometry_col)
    splice_cols = [c for c in shaped.columns if c.startswith("__splice_")]
    prop_cols = [c for c in shaped.columns
                 if c != geometry_col and not c.startswith("__splice_")]
    props = F.to_json(F.struct(*[F.col(c) for c in prop_cols]),
                      {"ignoreNullFields": "false"})
    for sc in splice_cols:
        key = sc[len("__splice_"):]
        # '{"a":1}' -> '{"<key>":<fragment>,"a":1}'
        props = F.concat(F.lit('{"' + key + '":'), F.col(sc),
                         F.lit(","), F.substring(props, 2, 1 << 30))
    feature = F.concat(
        F.lit('{"type":"Feature","properties":'), props,
        F.lit(',"geometry":'), F.col(geometry_col), F.lit("}"))
    return shaped.select(F.col("id").alias("__id"), feature.alias("feature"))


def write_reference_feature_collection(df: DataFrame, path: str,
                                       ski_areas: DataFrame | None = None,
                                       geometry_col: str = "geometry") -> None:
    """Single reference-contract FeatureCollection file, id-ordered."""
    rows = (reference_feature_json(df, ski_areas, geometry_col)
            .orderBy("__id").select("feature").toLocalIterator(prefetchPartitions=True))
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        f.write('{"type":"FeatureCollection","features":[')
        for i, r in enumerate(rows):
            if i:
                f.write(",")
            f.write(r.feature)
        f.write("]}")
