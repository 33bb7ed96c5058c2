"""Per-ski-area statistics (SURVEY.md A2) — the reference's
``skiAreaStatistics`` (src/statistics/SkiAreaStatistics.ts:37-235)
re-expressed as a two-level partial+final hash aggregation.

Semantics preserved:
- runs grouped by activity × difficulty (difficulty null → "other"),
  per-group {count, length_in_km, snowmaking/snowfarming length,
  combined |elevation change|, min/max elevation}; Polygon runs excluded
  (SkiAreaStatistics.ts:113-115); only downhill/nordic activities count;
- lifts grouped by lift type with the same measures (operating lifts only —
  prepareLift gives non-operating lifts no activities);
- area-level "lift-serviced" envelope: max = min(runMax, liftMax),
  min = max(runMin, liftMin) when both exist (SkiAreaStatistics.ts:71-91).

Scale: runs/lifts explode to (ski_area, activity) rows once, then a single
shuffle per grouping level; the maps assemble with ``map_from_entries`` over
sorted collect_lists so output bytes are deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.geometry import elevation_stats_udf, geometry_length_km_udf

SKI_AREA_ACTIVITIES = ("downhill", "nordic")


def _sorted_by_key(entries, key: str):
    """Sort struct entries by one field (needed when the struct payload
    contains a map, which Spark cannot order natively)."""
    return F.array_sort(
        entries,
        lambda l, r: F.when(l[key] < r[key], -1)
                      .when(l[key] > r[key], 1).otherwise(0))


def _measures():
    return [
        F.count("*").alias("count"),
        F.sum("length_km").alias("length_in_km"),
        F.sum(F.when(F.col("snowmaking"), F.col("length_km")).otherwise(0.0))
            .alias("snowmaking_length_in_km"),
        F.sum(F.when(F.col("snowfarming"), F.col("length_km")).otherwise(0.0))
            .alias("snowfarming_length_in_km"),
        F.sum(F.abs(F.col("elevation_change"))).alias("combined_elevation_change"),
        F.min("min_elevation").alias("min_elevation"),
        F.max("max_elevation").alias("max_elevation"),
    ]


def run_statistics(runs: DataFrame) -> DataFrame:
    """(ski_area_id, run stats struct) from clustered runs.

    ``runs`` needs: ski_areas array<string>, geometry, activities,
    difficulty, snowmaking, snowfarming."""
    base = (
        runs.filter(F.get_json_object("geometry", "$.type") != "Polygon")
        .filter(F.size("ski_areas") > 0)
        .select(
            F.explode("ski_areas").alias("ski_area_id"),
            F.explode_outer(F.array_intersect(
                "activities",
                F.array(*[F.lit(a) for a in SKI_AREA_ACTIVITIES])))
                .alias("activity"),
            F.coalesce(F.col("difficulty"), F.lit("other")).alias("difficulty"),
            F.coalesce(F.col("snowmaking"), F.lit(False)).alias("snowmaking"),
            F.coalesce(F.col("snowfarming"), F.lit(False)).alias("snowfarming"),
            geometry_length_km_udf("geometry").alias("length_km"),
            elevation_stats_udf("geometry").alias("elev"),
        )
        .filter(F.col("activity").isNotNull())
        .select("*", "elev.*").drop("elev")
        .withColumn("elevation_change",
                    F.coalesce("elevation_change", F.lit(0.0)))
    )
    by_difficulty = base.groupBy("ski_area_id", "activity", "difficulty") \
                        .agg(*_measures())
    by_activity = (
        by_difficulty.groupBy("ski_area_id", "activity")
        .agg(F.map_from_entries(F.sort_array(F.collect_list(
            F.struct("difficulty",
                     F.struct("count", "length_in_km",
                              "snowmaking_length_in_km",
                              "snowfarming_length_in_km",
                              "combined_elevation_change",
                              "min_elevation", "max_elevation")))))
            .alias("by_difficulty"),
             F.min("min_elevation").alias("min_elevation"),
             F.max("max_elevation").alias("max_elevation")))
    return (
        by_activity.groupBy("ski_area_id")
        .agg(F.map_from_entries(_sorted_by_key(F.collect_list(
            F.struct("activity", "by_difficulty")), "activity"))
            .alias("by_activity"),
             F.min("min_elevation").alias("min_elevation"),
             F.max("max_elevation").alias("max_elevation"))
        .select("ski_area_id",
                F.struct("by_activity", "min_elevation", "max_elevation")
                 .alias("runs"))
    )


def lift_statistics(lifts: DataFrame) -> DataFrame:
    """(ski_area_id, lift stats struct): operating lifts by lift type."""
    base = (
        lifts.filter(F.size("ski_areas") > 0)
        .filter(F.col("status") == "operating")
        .select(
            F.explode("ski_areas").alias("ski_area_id"),
            F.col("lift_type"),
            geometry_length_km_udf("geometry").alias("length_km"),
            elevation_stats_udf("geometry").alias("elev"),
        )
        .select("*", "elev.*").drop("elev")
        .withColumn("elevation_change",
                    F.coalesce("elevation_change", F.lit(0.0)))
        .withColumn("snowmaking", F.lit(False))
        .withColumn("snowfarming", F.lit(False))
    )
    by_type = base.groupBy("ski_area_id", "lift_type").agg(*_measures())
    return (
        by_type.groupBy("ski_area_id")
        .agg(F.map_from_entries(F.sort_array(F.collect_list(
            F.struct("lift_type",
                     F.struct("count", "length_in_km",
                              "combined_elevation_change",
                              "min_elevation", "max_elevation")))))
            .alias("by_type"),
             F.min("min_elevation").alias("min_elevation"),
             F.max("max_elevation").alias("max_elevation"))
        .select("ski_area_id",
                F.struct("by_type", "min_elevation", "max_elevation")
                 .alias("lifts"))
    )


def ski_area_statistics(runs: DataFrame, lifts: DataFrame) -> DataFrame:
    """(ski_area_id, statistics struct) — the full A2 rollup."""
    r = run_statistics(runs)
    l = lift_statistics(lifts)
    joined = r.join(l, "ski_area_id", "full_outer")
    run_max, lift_max = F.col("runs.max_elevation"), F.col("lifts.max_elevation")
    run_min, lift_min = F.col("runs.min_elevation"), F.col("lifts.min_elevation")
    # Lift-serviced envelope (SkiAreaStatistics.ts:71-91).
    max_elev = (F.when(run_max.isNull(), lift_max)
                 .when(lift_max.isNull(), run_max)
                 .otherwise(F.least(run_max, lift_max)))
    min_elev = (F.when(run_min.isNull(), lift_min)
                 .when(lift_min.isNull(), run_min)
                 .otherwise(F.greatest(run_min, lift_min)))
    return joined.select(
        "ski_area_id",
        F.struct(F.col("runs"), F.col("lifts"),
                 min_elev.alias("min_elevation"),
                 max_elev.alias("max_elevation")).alias("statistics"))
