"""P10 — Mapbox-GL style projections (src/transforms/MapboxGLFormatter.ts:
60-246): slim render-oriented properties per layer, matching the
reference's exported mapboxgl_*.geojson property contract
(PrepareGeoJSON.int.test.ts snapshots).

All derived columns are Catalyst expressions; the per-use parallel line
offsets are the W4 pattern — one FEATURE per run, with one offset column
per present use (offset = idx − (n−1)/2 over the unique sorted mapped
uses, MapboxGLFormatter.ts:104-121); ski-area polygons render as interior
points (P11, GeoTransforms.ts:31-82).

Color values: the run-blue and lift-operating HSL constants are
snapshot-verified against the reference output
(PrepareGeoJSON.int.test.ts:258,329); the remaining entries follow the
same scheme but are engine-chosen placeholders (the upstream constant
table lives in the unvendored openskidata-format package).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.geometry import interior_point_udf
from ..sinks.csv import run_color

# colorName → rendered HSL value (runColorNameToValue).
RUN_COLOR_VALUES = {
    "green": "hsl(125, 100%, 33%)",   # placeholder (same scheme)
    "blue": "hsl(208, 100%, 33%)",    # snapshot-verified
    "red": "hsl(359, 94%, 53%)",      # placeholder
    "black": "hsl(0, 0%, 0%)",        # placeholder
    "orange": "hsl(34, 100%, 50%)",   # placeholder
    "grey": "hsl(0, 0%, 55%)",        # placeholder
}

# status → lift line color (getLiftColor); operating is snapshot-verified.
LIFT_COLOR_VALUES = {
    "operating": "hsl(0, 82%, 42%)",
}
LIFT_COLOR_DEFAULT = "hsl(0, 0%, 55%)"

# liftType → human label for name_and_type (getLiftNameAndType);
# "T-bar" is snapshot-verified.
LIFT_TYPE_LABELS = {
    "cable_car": "Cable Car", "gondola": "Gondola",
    "hybrid": "Hybrid", "chair_lift": "Chairlift",
    "mixed_lift": "Mixed Lift", "drag_lift": "Drag Lift",
    "t-bar": "T-bar", "j-bar": "J-bar", "platter": "Platter",
    "rope_tow": "Rope Tow", "magic_carpet": "Magic Carpet",
    "funicular": "Funicular", "zip_line": "Zip Line",
    "funitel": "Funitel", "railway": "Railway",
}

_MAPBOX_USES = ("downhill", "nordic", "skitour")


def _lookup(mapping: dict[str, str], key: Column,
            default: str | None = None) -> Column:
    expr = F.lit(default)
    for k, v in mapping.items():
        expr = F.when(key == k, F.lit(v)).otherwise(expr)
    return expr


def _name_including_ref(name: Column, ref: Column) -> Column:
    """getNameIncludingRef (MapboxGLFormatter.ts:253-263)."""
    return (F.when(ref.isNull(), name)
            .when(name.isNull(), ref)
            .otherwise(F.concat(ref, F.lit(" - "), name)))


def mapbox_runs(runs: DataFrame) -> DataFrame:
    """Runs → one render feature per run; per-use parallel line offsets as
    downhill/nordic/skitour/other columns; connection-only runs dropped
    (MapboxGLFormatter.ts:79-127)."""
    kept = runs.filter(
        F.exists("uses", lambda u: u != "connection"))
    # mapboxGLRunUse: downhill/nordic/skitour pass through, rest → other
    mapped = F.array_sort(F.array_distinct(F.transform(
        "uses", lambda u: F.when(u.isin(*_MAPBOX_USES), u)
                           .otherwise(F.lit("other")))))
    kept = kept.withColumn("__uses", mapped)
    n = F.size("__uses")

    def offset(use: str) -> Column:
        pos = F.array_position("__uses", use)  # 1-based, 0 when absent
        return F.when(pos > 0, (pos - 1) - (n - 1) / 2.0)

    color_name = run_color(F.col("difficulty_convention"),
                           F.col("difficulty"))
    return kept.select(
        F.col("id"),
        _name_including_ref(F.col("name"), F.col("ref")).alias("name"),
        F.col("difficulty"), F.col("oneway"), F.col("lit"),
        F.col("gladed"), F.col("patrolled"),
        _lookup(RUN_COLOR_VALUES, color_name).alias("color"),
        color_name.alias("colorName"),
        F.col("grooming"), F.col("snowmaking"), F.col("snowfarming"),
        F.col("tunnel"),
        F.col("ski_areas").alias("skiAreas"),
        offset("downhill").alias("downhill"),
        offset("nordic").alias("nordic"),
        offset("skitour").alias("skitour"),
        offset("other").alias("other"),
        F.col("geometry"))


def mapbox_lifts(lifts: DataFrame) -> DataFrame:
    """Lifts → render rows (MapboxGLFormatter.ts:131-151): name_and_type
    ("Name (Type)" plus ref), status color, station ids."""
    label = _lookup(LIFT_TYPE_LABELS, F.col("lift_type"))
    name_and_type = (F.when(F.col("name").isNotNull() & label.isNotNull(),
                            F.concat(F.col("name"), F.lit(" ("),
                                     label, F.lit(")")))
                     .otherwise(F.coalesce(F.col("name"), label)))
    station_ids = (F.transform("stations", lambda s: s["id"])
                   if "stations" in lifts.columns
                   else F.array().cast("array<string>"))
    return lifts.select(
        F.col("id"),
        _name_including_ref(name_and_type, F.col("ref"))
            .alias("name_and_type"),
        _lookup(LIFT_COLOR_VALUES, F.col("status"), LIFT_COLOR_DEFAULT)
            .alias("color"),
        F.col("status"), F.col("access"),
        station_ids.alias("stationIds"),
        F.col("ski_areas").alias("skiAreas"),
        F.col("tunnel"),
        F.col("geometry"))


def mapbox_ski_areas(ski_areas: DataFrame) -> DataFrame:
    """Ski areas render as interior points (never polygons on the map);
    rounded distance/elevation stats, name shortened by dropping the
    parenthetical when over 20 chars (shortenedName,
    MapboxGLFormatter.ts:204-251)."""
    is_poly = F.get_json_object("geometry", "$.type") \
        .isin("Polygon", "MultiPolygon")
    name = F.col("name")
    short = F.when(
        name.isNotNull() & (F.length(name) > 20),
        F.trim(F.split(name, r"\(")[0])).otherwise(name)
    stats = (F.col("statistics") if "statistics" in ski_areas.columns
             else F.lit(None))

    def act_distance(act: str) -> Column:
        if "statistics" not in ski_areas.columns:
            return F.lit(None).cast("long")
        by_diff = F.element_at(stats["runs"]["by_activity"], act)
        total = F.aggregate(F.map_values(by_diff),
                            F.lit(0.0), lambda a, x: a + x["length_in_km"])
        return F.when(by_diff.isNotNull(),
                      F.round(total, 0).cast("long"))

    if "statistics" in ski_areas.columns:
        max_elev = F.when(stats["max_elevation"] != 0,
                          F.round(stats["max_elevation"], 0).cast("long"))
        vertical = F.when(
            (stats["max_elevation"] != 0) & (stats["min_elevation"] != 0),
            F.round(stats["max_elevation"] - stats["min_elevation"], 0)
             .cast("long"))
    else:
        max_elev = vertical = F.lit(None).cast("long")

    return ski_areas.select(
        "id", short.alias("name"), "status",
        act_distance("downhill").alias("downhillDistance"),
        act_distance("nordic").alias("nordicDistance"),
        max_elev.alias("maxElevation"),
        vertical.alias("vertical"),
        F.array_contains("activities", "downhill").alias("has_downhill"),
        F.array_contains("activities", "nordic").alias("has_nordic"),
        F.when(is_poly, interior_point_udf("geometry"))
         .otherwise(F.col("geometry")).alias("geometry"))


def mapbox_spots(spots: DataFrame) -> DataFrame:
    """Spots → render rows (MapboxGLFormatter.ts:153-195): common
    id/spotType/skiAreas plus the lift-station or crossing extras."""
    lift_station = F.col("spot_type") == "lift_station"
    crossing = F.col("spot_type") == "crossing"
    lift_id = (F.col("associated_lift_id")
               if "associated_lift_id" in spots.columns else F.lit(None))
    return spots.select(
        F.col("id"), F.col("spot_type").alias("spotType"),
        F.col("ski_areas").alias("skiAreas"),
        F.when(lift_station, F.col("name")).alias("name"),
        F.when(lift_station, lift_id).alias("liftId"),
        F.when(lift_station, F.col("position")).alias("position"),
        F.when(lift_station, F.col("entry")).alias("entry"),
        F.when(lift_station, F.col("exit")).alias("exit"),
        F.when(crossing, F.col("dismount")).alias("dismount"),
        F.col("geometry"))
