"""K2 — CSV sink with the reference's four fixed schemas
(src/transforms/CSVFormatter.ts:125-140 headers, :172-293 derived columns).

All derived columns are Catalyst expressions except the elevation metrics
(3D-geometry pandas UDF); place roll-ups are
``array_sort(array_distinct(transform(places, ...)))`` joined with ';'
(P13/A9, CSVFormatter.ts:338-355); escaping is Spark's CSV writer.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.geometry import centroid_udf, elevation_metrics_udf

# Exact reference headers (CSVFormatter.ts:125-140).
RUN_HEADERS = ("name,ref,countries,regions,localities,ski_area_names,"
               "difficulty,color,oneway,lit,gladed,patrolled,grooming,uses,"
               "inclined_length_m,descent_m,ascent_m,average_pitch_%,"
               "max_pitch_%,min_elevation_m,max_elevation_m,"
               "difficulty_convention,wikidata_id,websites,openskimap,id,"
               "geometry,lat,lng,ski_area_ids,sources,description").split(",")
LIFT_HEADERS = ("name,ref,ref_fr_cairn,lift_type,status,access,countries,"
                "regions,localities,ski_area_names,oneway,duration_sec,"
                "capacity,occupancy,detachable,bubble,heating,"
                "inclined_length_m,vertical_m,speed_m_per_s,"
                "vertical_speed_m_per_s,min_elevation_m,max_elevation_m,"
                "overall_pitch_%,wikidata_id,websites,openskimap,id,geometry,"
                "lat,lng,ski_area_ids,sources,description").split(",")
SKI_AREA_HEADERS = ("name,countries,regions,localities,status,has_downhill,"
                    "has_nordic,downhill_distance_km,nordic_distance_km,"
                    "vertical_m,min_elevation_m,max_elevation_m,lift_count,"
                    "surface_lifts_count,run_convention,wikidata_id,websites,"
                    "openskimap,id,geometry,lat,lng,sources").split(",")
SPOT_HEADERS = ("id,spot_type,longitude,latitude,sources,ski_areas,countries,"
                "regions,localities,dismount,name,position,entry,"
                "exit").split(",")

# Run color by (convention, difficulty) — the published openskidata-format
# color conventions (green/blue/red/black/orange, grey when unknown).
_COLOR = {
    "europe": {"novice": "green", "easy": "blue", "intermediate": "red",
               "advanced": "black", "expert": "black",
               "freeride": "orange", "extreme": "orange"},
    "north_america": {"novice": "green", "easy": "green",
                      "intermediate": "blue", "advanced": "black",
                      "expert": "black", "freeride": "orange",
                      "extreme": "orange"},
    "japan": {"novice": "green", "easy": "green", "intermediate": "red",
              "advanced": "black", "expert": "black",
              "freeride": "orange", "extreme": "orange"},
}

SURFACE_LIFT_TYPES = ("t-bar", "j-bar", "platter", "rope_tow", "drag_lift",
                      "magic_carpet")




def _with_ski_area_names(df: DataFrame,
                         ski_areas: DataFrame | None) -> DataFrame:
    """J8 export join (FeatureExporter.ts:148-161): resolve the feature's
    ski-area ids to names, sorted-unique ','-joined (extractSkiAreaNames —
    the CSV writer quotes the comma-bearing field, = escapeField).  Without
    a ski-area
    table the column stays empty (the reference pre-clustering shape)."""
    if ski_areas is None or "ski_areas" not in df.columns:
        return df.withColumn("__sa_names", F.lit(""))
    names = ski_areas.select(F.col("id").alias("__said"),
                             F.col("name").alias("__sname"))
    resolved = (df.select(F.col("id").alias("__fid"),
                          F.explode("ski_areas").alias("__said"))
                .join(F.broadcast(names), "__said")
                .filter(F.col("__sname").isNotNull())
                .groupBy("__fid")
                .agg(F.concat_ws(",", F.array_sort(
                    F.collect_set("__sname"))).alias("__names")))
    return (df.join(resolved, df["id"] == resolved["__fid"], "left")
            .withColumn("__sa_names", F.coalesce("__names", F.lit("")))
            .drop("__fid", "__names"))


def run_color(convention: Column, difficulty: Column) -> Column:
    expr = F.lit("grey")
    for conv, table in _COLOR.items():
        for diff, color in table.items():
            expr = F.when((convention == conv) & (difficulty == diff),
                          F.lit(color)).otherwise(expr)
    return expr


def _place_rollup(df: DataFrame, field: str) -> Column:
    """Sorted-unique ';'-joined place names (CSVFormatter.ts:338-355).

    Supports both place shapes: the engine's flat
    ``{country, region, locality}`` and the reference Geocoder's nested
    ``{iso3166_1Alpha2, iso3166_2, localized: {en: {country, region,
    locality}}}`` (Geocoder.ts:45-55) — chosen by schema inspection, so
    the projection stays a static Catalyst expression."""
    if "places" not in df.columns:
        return F.lit("")
    from pyspark.sql.types import ArrayType, StructType

    elem = df.schema["places"].dataType
    nested = (isinstance(elem, ArrayType)
              and isinstance(elem.elementType, StructType)
              and "localized" in elem.elementType.fieldNames())
    getter = ((lambda p: p["localized"]["en"][field]) if nested
              else (lambda p: p[field]))
    vals = F.filter(F.transform(F.col("places"), getter),
                    lambda v: v.isNotNull())
    return F.concat_ws(";", F.array_sort(F.array_distinct(vals)))


def _common(df: DataFrame):
    center = F.from_json(
        F.get_json_object(centroid_udf("geometry"), "$.coordinates"),
        "array<double>")
    return {
        "countries": _place_rollup(df, "country"),
        "regions": _place_rollup(df, "region"),
        "localities": _place_rollup(df, "locality"),
        "openskimap": F.concat(F.lit("https://openskimap.org/?obj="),
                               F.col("id")),
        "geometry": F.get_json_object("geometry", "$.type"),
        # toFixed(6), no thousands separators (CSVFormatter.ts:164-165)
        "lat": F.format_string("%.6f", center[1]),
        "lng": F.format_string("%.6f", center[0]),
        # sorted, SPACE-joined (formatWebsites/formatSources,
        # CSVFormatter.ts:358-367)
        "websites": F.concat_ws(" ", F.array_sort("websites"))
            if "websites" in df.columns else F.lit(""),
        "sources": F.concat_ws(" ", F.array_sort(F.transform(
            "sources", _source_url))),
    }


def _source_url(s: Column) -> Column:
    """getSourceURL (openskidata-format): per-source canonical URL."""
    return (F.when(s["type"] == "openstreetmap",
                   F.concat(F.lit("https://www.openstreetmap.org/"), s["id"]))
            .when(s["type"] == "skimap.org",
                  F.concat(F.lit("https://www.skimap.org/SkiAreas/view/"),
                           s["id"]))
            .otherwise(s["id"]))


def _bool(col: Column) -> Column:
    """formatBoolean (CSVFormatter.ts:319-322): yes / no / empty."""
    return (F.when(col.isNull(), F.lit(""))
            .when(col.cast("boolean"), F.lit("yes")).otherwise(F.lit("no")))


def run_csv(runs: DataFrame,
            ski_areas: DataFrame | None = None) -> DataFrame:
    """Run layer → the 31-column reference CSV schema.  Pass the clustered
    ``ski_areas`` layer to resolve ski_area_names (J8)."""
    runs = _with_ski_area_names(runs, ski_areas)
    c = _common(runs)
    m = elevation_metrics_udf("geometry")
    df = runs.withColumn("__m", m)
    # averagePitchInPercent is the GRADE RATIO toFixed(2) — the reference
    # vector prints 0.96 for a 200 m drop over 208 m (CSVFormatter.unit.
    # test.ts:171), despite the _% header
    pct = lambda col: F.format_string("%.2f", col)  # noqa: E731
    return df.select(
        F.col("name"), F.col("ref"),
        c["countries"].alias("countries"), c["regions"].alias("regions"),
        c["localities"].alias("localities"),
        F.col("__sa_names").alias("ski_area_names"),
        F.col("difficulty"),
        run_color(F.col("difficulty_convention"), F.col("difficulty"))
            .alias("color"),
        _bool(F.col("oneway")).alias("oneway"), _bool(F.col("lit")).alias("lit"),
        _bool(F.col("gladed")).alias("gladed"),
        _bool(F.col("patrolled")).alias("patrolled"),
        F.col("grooming"),
        F.concat_ws(";", "uses").alias("uses"),
        # toFixed() integers / toFixed(2) percents (CSVFormatter.ts:194-200)
        F.format_string("%.0f", "__m.inclined_length_m")
            .alias("inclined_length_m"),
        F.format_string("%.0f", "__m.descent_m").alias("descent_m"),
        F.format_string("%.0f", "__m.ascent_m").alias("ascent_m"),
        pct(F.col("__m.average_pitch")).alias("average_pitch_%"),
        pct(F.col("__m.max_pitch")).alias("max_pitch_%"),
        F.format_string("%.0f", "__m.min_elevation_m")
            .alias("min_elevation_m"),
        F.format_string("%.0f", "__m.max_elevation_m")
            .alias("max_elevation_m"),
        F.col("difficulty_convention"), F.col("wikidata_id"),
        c["websites"].alias("websites"), c["openskimap"].alias("openskimap"),
        F.col("id"), c["geometry"].alias("geometry"),
        c["lat"].alias("lat"), c["lng"].alias("lng"),
        F.concat_ws(";", F.array_sort("ski_areas")).alias("ski_area_ids"),
        c["sources"].alias("sources"), F.col("description"),
    )


def lift_csv(lifts: DataFrame,
             ski_areas: DataFrame | None = None) -> DataFrame:
    lifts = _with_ski_area_names(lifts, ski_areas)
    c = _common(lifts)
    df = lifts.withColumn("__m", elevation_metrics_udf("geometry"))
    vertical = F.col("__m.max_elevation_m") - F.col("__m.min_elevation_m")
    # toFixed precisions per CSVFormatter.ts:233-239
    speed = F.when(F.col("duration") > 0, F.format_string(
        "%.1f", F.col("__m.inclined_length_m") / F.col("duration")))
    vspeed = F.when(F.col("duration") > 0,
                    F.format_string("%.2f", vertical / F.col("duration")))
    pitch = F.when(F.col("__m.inclined_length_m") > 0, F.format_string(
        "%.2f", vertical / F.col("__m.inclined_length_m")))
    return df.select(
        F.col("name"), F.col("ref"),
        F.col("ref_fr_cairn"), F.col("lift_type"), F.col("status"),
        F.col("access"),
        c["countries"].alias("countries"), c["regions"].alias("regions"),
        c["localities"].alias("localities"),
        F.col("__sa_names").alias("ski_area_names"),
        _bool(F.col("oneway")).alias("oneway"),
        # falsy -> empty (CSVFormatter.ts:227-229)
        F.when(F.col("duration") > 0, F.col("duration")).alias("duration_sec"),
        F.when(F.col("capacity") > 0, F.col("capacity")).alias("capacity"),
        F.when(F.col("occupancy") > 0, F.col("occupancy")).alias("occupancy"),
        _bool(F.col("detachable")).alias("detachable"),
        _bool(F.col("bubble")).alias("bubble"),
        _bool(F.col("heating")).alias("heating"),
        F.format_string("%.0f", "__m.inclined_length_m")
            .alias("inclined_length_m"),
        F.format_string("%.0f", vertical).alias("vertical_m"),
        speed.alias("speed_m_per_s"),
        vspeed.alias("vertical_speed_m_per_s"),
        F.format_string("%.0f", "__m.min_elevation_m")
            .alias("min_elevation_m"),
        F.format_string("%.0f", "__m.max_elevation_m")
            .alias("max_elevation_m"),
        pitch.alias("overall_pitch_%"),
        F.col("wikidata_id"), c["websites"].alias("websites"),
        c["openskimap"].alias("openskimap"), F.col("id"),
        c["geometry"].alias("geometry"),
        c["lat"].alias("lat"), c["lng"].alias("lng"),
        F.concat_ws(";", F.array_sort("ski_areas")).alias("ski_area_ids"),
        c["sources"].alias("sources"), F.col("description"),
    )


def ski_area_csv(ski_areas: DataFrame) -> DataFrame:
    """Ski-area CSV: activity flags + distances/lift counts from the A2
    statistics struct (A8 — aggregate over the map values, no re-scan of
    the fact layers; CSVFormatter.ts:379-408)."""
    c = _common(ski_areas)
    stats = F.col("statistics")

    def act_distance(act: str) -> Column:
        by_diff = F.element_at(stats["runs"]["by_activity"], act)
        total = F.aggregate(
            F.map_values(F.coalesce(
                by_diff, F.map_from_arrays(
                    F.array().cast("array<string>"),
                    F.array().cast(
                        "array<struct<count:bigint,length_in_km:double,"
                        "snowmaking_length_in_km:double,"
                        "snowfarming_length_in_km:double,"
                        "combined_elevation_change:double,"
                        "min_elevation:double,max_elevation:double>>")))),
            F.lit(0.0), lambda acc, x: acc + x["length_in_km"])
        # Math.round integer, empty when the activity is absent
        # (CSVFormatter.ts:263-273)
        return F.when(by_diff.isNotNull(), F.round(total, 0).cast("long"))

    lift_counts = F.map_values(F.coalesce(
        stats["lifts"]["by_type"],
        F.map_from_arrays(
            F.array().cast("array<string>"),
            F.array().cast("array<struct<count:bigint,length_in_km:double,"
                           "combined_elevation_change:double,"
                           "min_elevation:double,max_elevation:double>>"))))
    lift_entries = F.map_entries(F.coalesce(
        stats["lifts"]["by_type"],
        F.map_from_arrays(
            F.array().cast("array<string>"),
            F.array().cast("array<struct<count:bigint,length_in_km:double,"
                           "combined_elevation_change:double,"
                           "min_elevation:double,max_elevation:double>>"))))
    n_lifts = F.aggregate(lift_counts, F.lit(0).cast("long"),
                          lambda acc, x: acc + x["count"])
    n_surface = F.aggregate(
        lift_entries, F.lit(0).cast("long"),
        lambda acc, e: acc + F.when(
            e["key"].isin(*SURFACE_LIFT_TYPES), e["value"]["count"])
            .otherwise(F.lit(0).cast("long")))
    vertical = stats["max_elevation"] - stats["min_elevation"]

    return ski_areas.select(
        F.col("name"),
        c["countries"].alias("countries"), c["regions"].alias("regions"),
        c["localities"].alias("localities"),
        F.col("status"),
        _bool(F.array_contains("activities", "downhill"))
            .alias("has_downhill"),
        _bool(F.array_contains("activities", "nordic")).alias("has_nordic"),
        act_distance("downhill").alias("downhill_distance_km"),
        act_distance("nordic").alias("nordic_distance_km"),
        # Math.round integers, empty on falsy elevations / zero counts
        # (CSVFormatter.ts:274-283)
        F.when((stats["max_elevation"] != 0) & (stats["min_elevation"] != 0),
               F.round(vertical, 0).cast("long")).alias("vertical_m"),
        F.when(stats["min_elevation"] != 0,
               F.round(stats["min_elevation"], 0).cast("long"))
            .alias("min_elevation_m"),
        F.when(stats["max_elevation"] != 0,
               F.round(stats["max_elevation"], 0).cast("long"))
            .alias("max_elevation_m"),
        F.when(n_lifts > 0, n_lifts).alias("lift_count"),
        F.when(n_surface > 0, n_surface).alias("surface_lifts_count"),
        F.col("run_convention"), F.col("wikidata_id"),
        c["websites"].alias("websites"), c["openskimap"].alias("openskimap"),
        F.col("id"), c["geometry"].alias("geometry"),
        c["lat"].alias("lat"), c["lng"].alias("lng"),
        c["sources"].alias("sources"),
    )


def spot_csv(spots: DataFrame,
             ski_areas: DataFrame | None = None) -> DataFrame:
    spots = _with_ski_area_names(spots, ski_areas)
    c = _common(spots)
    center = F.from_json(
        F.get_json_object("geometry", "$.coordinates"), "array<double>")
    return spots.select(
        F.col("id"), F.col("spot_type"),
        F.format_string("%.6f", center[0]).alias("longitude"),
        F.format_string("%.6f", center[1]).alias("latitude"),
        c["sources"].alias("sources"),
        # spot ski_areas column carries resolved NAMES (formatSpot uses
        # extractSkiAreaNames, CSVFormatter.ts:416)
        F.col("__sa_names").alias("ski_areas"),
        c["countries"].alias("countries"), c["regions"].alias("regions"),
        c["localities"].alias("localities"),
        F.col("dismount"), F.col("name"), F.col("position"),
        _bool(F.col("entry")).alias("entry"),
        _bool(F.col("exit")).alias("exit"),
    )


def write_csv(df: DataFrame, path: str, single_file: bool = False) -> None:
    """Spark CSV writer (RFC escaping built in, O1 id-order when single)."""
    out = df
    if single_file:
        out = out.coalesce(1)
    out.write.mode("overwrite").option("header", True).csv(path)
