"""Snow-cover cache producer: VIIRS VNP10A1F weekly snow/cloud values.

The engine's snow join (``pipeline.enrichment.snow_cover_history``, J7/A6)
consumes a long cache table ``(pixel_key "h:v:col:row", year, week, snow,
cloud)``.  The reference populates it with a Python pipeline
(``snow-cover/src/fetch_snow_data.py:23-120`` driving
``data_fetcher.py:25-260``): group pixels by sinusoidal tile, determine
missing (pixel, week) cells against the archive, download one HDF tile per
(tile, date) and extract all wanted pixels from it, recording error codes
in the archive — 301 permanent-missing for old dates, 400 retryable-missing
for recent dates, 401 other errors (``constants.py:9-11``).

This module is that producer as a Spark stage.  The HDF download + h5py
pixel extraction is the injected ``fetch_tile_week`` callable (the
container has no h5py/requests — tests inject a deterministic fake; a real
deployment wraps the NSIDC client the reference uses):

    fetch_tile_week(h, v, year, week, pixels) -> list[(snow, cloud)] | None
        pixels: [(row, col), ...]; one call per (tile, year, week) —
        the reference's batching unit (one HDF file serves every pixel
        in the tile).  ``None`` = tile not published for that week.

Scale shape: misses repartition by tile so each (tile, year, week) HDF is
fetched exactly once per run; fetch count is bounded by tiles × weeks,
never by pixel count (a resort has thousands of pixels in one tile).
"""

from __future__ import annotations

from typing import Callable, Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# constants.py:9-11
ERROR_OLD_MISSING = 301      # permanent: never refetched
ERROR_RECENT_MISSING = 400   # retryable: stays a miss next run
ERROR_OTHER = 401            # retryable

FetchTileWeek = Callable[[int, int, int, int, list], "list | None"]

SNOW_ROW_DDL = ("pixel_key string, year int, week int, "
                "snow int, cloud int")


def snow_cache_misses(pixels: DataFrame, snow_cache: DataFrame,
                      year_weeks: list[tuple[int, int]]) -> DataFrame:
    """(pixel_key, year, week) cells still needing a fetch.

    ``pixels``: one column ``pixel_key`` (distinct pixels from
    ``enrichment.geometry_viirs_pixels``).  The requested grid is
    pixels × ``year_weeks``; a cell is resolved once the cache holds a
    real value (0-100) or a *permanent* miss (301).  Retryable codes
    (400/401) surface again — the archive semantics of
    ``get_missing_weeks_for_pixel``."""
    spark = pixels.sparkSession
    grid = spark.createDataFrame(year_weeks, "year int, week int")
    wanted = pixels.select("pixel_key").distinct().crossJoin(grid)
    settled = (snow_cache
               .filter(((F.col("snow") >= 0) & (F.col("snow") <= 100))
                       | (F.col("snow") == ERROR_OLD_MISSING))
               .select("pixel_key", "year", "week"))
    return wanted.join(settled, ["pixel_key", "year", "week"], "left_anti")


def fetch_snow_updates(misses: DataFrame, fetch_tile_week: FetchTileWeek,
                       is_old: Callable[[int, int], bool] | None = None
                       ) -> DataFrame:
    """Miss cells → snow cache rows, one fetch per (tile, year, week).

    Error contract (data_fetcher.py:232-260): a week the server has no
    tile for caches as 301 when the date is old (``is_old(year, week)``,
    default: always old — batch backfills run on history) or 400 when
    recent; an exception during fetch/extract caches 401.  Both 400 and
    401 remain misses on the next run; 301 settles the cell.
    """
    is_old = is_old or (lambda year, week: True)

    def run(parts: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in parts:
            if len(pdf) == 0:
                continue
            split = pdf["pixel_key"].str.split(":", expand=True).astype(int)
            pdf = pdf.assign(__h=split[0], __v=split[1],
                             __col=split[2], __row=split[3])
            for (h, v, year, week), grp in pdf.groupby(
                    ["__h", "__v", "year", "week"]):
                px = list(zip(grp["__row"], grp["__col"]))
                try:
                    values = fetch_tile_week(int(h), int(v), int(year),
                                             int(week), px)
                    if values is None:
                        code = (ERROR_OLD_MISSING if is_old(year, week)
                                else ERROR_RECENT_MISSING)
                        values = [(code, 0)] * len(px)
                    elif len(values) != len(px):
                        raise RuntimeError(
                            f"fetched {len(values)} values for "
                            f"{len(px)} pixels")
                except Exception:
                    values = [(ERROR_OTHER, 0)] * len(px)
                yield pd.DataFrame({
                    "pixel_key": list(grp["pixel_key"]),
                    "year": int(year), "week": int(week),
                    "snow": [int(s) for s, _ in values],
                    "cloud": [int(c) for _, c in values]})

    # One task owns a tile's whole miss set → each HDF pulled once.
    tile = F.concat_ws(":", F.split_part(F.col("pixel_key"), F.lit(":"),
                                         F.lit(1)),
                       F.split_part(F.col("pixel_key"), F.lit(":"),
                                    F.lit(2)))
    n_part = misses.sparkSession.sparkContext.defaultParallelism
    return (misses.repartition(n_part, tile)
            .mapInPandas(run, SNOW_ROW_DDL))


FETCH_POLICIES = ("full", "incremental", "none")


def fetch_snow_cover(pixels: DataFrame, cache: DataFrame,
                     year_weeks: list[tuple[int, int]],
                     fetch_tile_week: FetchTileWeek,
                     policy: str = "full",
                     is_old: Callable[[int, int], bool] | None = None
                     ) -> DataFrame:
    """Policy-gated snow-cover refresh → the updated cache table.

    The reference's three-mode switch (Config.ts:13-17,94-103 validates
    ``SNOW_COVER_FETCH_POLICY``; PrepareGeoJSON.ts:59-93 dispatches it;
    fetch_snow_data.py:216-236 implements the two fetch shapes):

    - ``"none"``  — skip fetching entirely; the cache is used as-is
      (PrepareGeoJSON.ts:64 returns before spawning the fetcher).
    - ``"incremental"`` — ``--fill-cache``: the pixel universe is the
      pixels ALREADY IN the archive (``discover_existing_pixels``),
      topped up with their missing weeks; newly-seen geometry pixels are
      not fetched this run.
    - ``"full"`` — the pixel universe comes from the runs geometry
      (``pixels``); every unsettled (pixel, week) cell is fetched.

    Both fetching modes share the miss/settlement semantics of
    ``snow_cache_misses`` (real value or permanent 301 settles; 400/401
    retry) and the one-HDF-per-(tile, week) batching of
    ``fetch_snow_updates``.
    """
    if policy not in FETCH_POLICIES:
        # Config.ts:99-103 raises on an unknown policy string
        raise ValueError(
            f"Invalid snow cover fetch policy: {policy!r}. "
            f"Must be one of: full, incremental, none")
    if policy == "none":
        return cache
    universe = (cache.select("pixel_key").distinct()
                if policy == "incremental" else pixels)
    misses = snow_cache_misses(universe, cache, year_weeks)
    fetched = fetch_snow_updates(misses, fetch_tile_week, is_old=is_old)
    return updated_snow_cache(cache, fetched)


def updated_snow_cache(cache: DataFrame, fetched: DataFrame) -> DataFrame:
    """Cache ∪ fetched; refreshed cells (retryable codes that now have a
    real value) replace the stale row."""
    keys = ["pixel_key", "year", "week"]
    kept = cache.join(fetched.select(*keys), keys, "left_anti")
    return kept.unionByName(fetched)
