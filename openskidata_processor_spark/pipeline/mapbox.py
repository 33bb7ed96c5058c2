"""P10 — Mapbox-GL style projections (src/transforms/MapboxGLFormatter.ts:
78-246): slim render-oriented properties per layer.

All derived columns are Catalyst expressions; the per-use parallel line
offsets are the W4 posexplode pattern (offset = idx − (n−1)/2,
:104-121); ski-area polygons render as interior points (P11,
GeoTransforms.ts:31-82)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.geometry import interior_point_udf
from ..sinks.csv import run_color


def _short_name(name, limit: int = 20):
    """Name shortening for map labels (MapboxGLFormatter.ts:249-251)."""
    return F.when(F.length(name) > limit,
                  F.concat(F.substring(name, 1, limit - 1), F.lit("…"))) \
            .otherwise(name)


def mapbox_runs(runs: DataFrame) -> DataFrame:
    """Runs → render rows, one per use, with parallel line offsets;
    connection-only runs are dropped (:87-93)."""
    kept = runs.filter(
        F.size(F.array_remove("uses", "connection")) > 0)
    with_offsets = kept.select(
        "id",
        F.posexplode(F.array_sort("uses")).alias("use_index", "use"),
        F.size("uses").alias("__n"),
        "name", "ref", "difficulty", "difficulty_convention", "oneway",
        "gladed", "patrolled", "grooming", "ski_areas", "geometry",
    ).withColumn("offset",
                 F.col("use_index") - (F.col("__n") - 1) / 2.0).drop("__n")
    name_and_ref = F.when(
        F.col("ref").isNotNull() & F.col("name").isNotNull(),
        F.concat(F.col("ref"), F.lit(" - "), F.col("name"))) \
        .otherwise(F.coalesce("name", "ref"))
    return with_offsets.select(
        "id", "use", "offset",
        _short_name(name_and_ref).alias("name"),
        run_color(F.col("difficulty_convention"), F.col("difficulty"))
            .alias("color"),
        "difficulty", "oneway", "gladed", "patrolled", "grooming",
        "ski_areas", "geometry")


def mapbox_lifts(lifts: DataFrame) -> DataFrame:
    name_and_ref = F.when(
        F.col("ref").isNotNull() & F.col("name").isNotNull(),
        F.concat(F.col("ref"), F.lit(" - "), F.col("name"))) \
        .otherwise(F.coalesce("name", "ref"))
    return lifts.select(
        "id", F.col("lift_type"), "status",
        _short_name(name_and_ref).alias("name"),
        "oneway", "occupancy", "capacity", "ski_areas", "geometry")


def mapbox_ski_areas(ski_areas: DataFrame) -> DataFrame:
    """Ski areas render as interior points (never polygons on the map)."""
    is_poly = F.get_json_object("geometry", "$.type") \
        .isin("Polygon", "MultiPolygon")
    return ski_areas.select(
        "id",
        _short_name(F.col("name")).alias("name"),
        "status", "activities",
        F.array_contains("activities", "downhill").alias("has_downhill"),
        F.array_contains("activities", "nordic").alias("has_nordic"),
        F.when(is_poly, interior_point_udf("geometry"))
         .otherwise(F.col("geometry")).alias("geometry"))
