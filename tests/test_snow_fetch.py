"""Snow-cover fetch skeleton tests (fetch_snow_data.py:23-120 /
data_fetcher.py error-code contract, as engine stages)."""

from __future__ import annotations

import json

import pytest

from openskidata_processor_spark.pipeline import enrichment as en
from openskidata_processor_spark.sources import snow as sn
from pyspark.sql import functions as F


@pytest.fixture()
def pixels(spark):
    # two pixels in tile (18, 4), one in tile (12, 3)
    return spark.createDataFrame(
        [("18:4:100:200",), ("18:4:101:200",), ("12:3:7:9",)],
        "pixel_key string")


def test_miss_grid_and_settlement(spark, pixels):
    empty = spark.createDataFrame([], sn.SNOW_ROW_DDL)
    weeks = [(2023, 1), (2023, 2)]
    misses = sn.snow_cache_misses(pixels, empty, weeks)
    assert misses.count() == 6  # 3 pixels × 2 weeks

    cache = spark.createDataFrame(
        [("18:4:100:200", 2023, 1, 80, 0),          # real value: settled
         ("18:4:101:200", 2023, 1, sn.ERROR_OLD_MISSING, 0),   # settled
         ("12:3:7:9", 2023, 1, sn.ERROR_RECENT_MISSING, 0),    # retryable
         ("12:3:7:9", 2023, 2, sn.ERROR_OTHER, 0)],            # retryable
        sn.SNOW_ROW_DDL)
    remaining = {(r.pixel_key, r.year, r.week)
                 for r in sn.snow_cache_misses(pixels, cache, weeks).collect()}
    assert ("18:4:100:200", 2023, 1) not in remaining
    assert ("18:4:101:200", 2023, 1) not in remaining
    assert ("12:3:7:9", 2023, 1) in remaining       # 400 retries
    assert ("12:3:7:9", 2023, 2) in remaining       # 401 retries
    assert len(remaining) == 4                      # 6 cells − 2 settled


def test_fetch_batches_per_tile_week(spark, pixels, tmp_path):
    """One fetch per (tile, year, week) no matter how many pixels —
    the reference's HDF-download batching unit."""
    empty = spark.createDataFrame([], sn.SNOW_ROW_DDL)
    misses = sn.snow_cache_misses(pixels, empty, [(2023, 1)])
    calls = tmp_path / "calls"

    def fake_fetch(h, v, year, week, px):
        with open(calls, "a") as f:
            f.write(f"{h}:{v}:{year}:{week}:{len(px)}\n")
        # snow = row mod 101 makes per-pixel alignment observable
        return [(row % 101, 1) for row, col in px]

    rows = {r.pixel_key: (r.snow, r.cloud)
            for r in sn.fetch_snow_updates(misses, fake_fetch).collect()}
    assert rows == {"18:4:100:200": (200 % 101, 1),
                    "18:4:101:200": (200 % 101, 1),
                    "12:3:7:9": (9, 1)}
    lines = sorted(calls.read_text().splitlines())
    assert lines == ["12:3:2023:1:1", "18:4:2023:1:2"]  # 2 calls, not 3


def test_fetch_error_codes(spark, pixels):
    empty = spark.createDataFrame([], sn.SNOW_ROW_DDL)
    misses = sn.snow_cache_misses(pixels, empty, [(2023, 1), (2024, 20)])

    def missing_or_raise(h, v, year, week, px):
        if year == 2023:
            return None          # tile never published
        raise RuntimeError("auth failed")

    out = sn.fetch_snow_updates(
        misses, missing_or_raise,
        is_old=lambda year, week: year < 2024).collect()
    codes = {(r.pixel_key, r.year): r.snow for r in out}
    assert codes[("18:4:100:200", 2023)] == sn.ERROR_OLD_MISSING
    assert codes[("18:4:100:200", 2024)] == sn.ERROR_OTHER
    # errors/misses are ARCHIVED (unlike elevation/geocode: the reference's
    # sqlite archive records attempt state), but 400/401 stay misses:
    cache = sn.updated_snow_cache(
        spark.createDataFrame([], sn.SNOW_ROW_DDL),
        sn.fetch_snow_updates(misses, missing_or_raise,
                              is_old=lambda y, w: y < 2024))
    again = sn.snow_cache_misses(pixels, cache, [(2023, 1), (2024, 20)])
    assert {(r.year) for r in again.collect()} == {2024}


def test_refetch_replaces_retryable_rows(spark, pixels):
    stale = spark.createDataFrame(
        [("18:4:100:200", 2023, 1, sn.ERROR_RECENT_MISSING, 0)],
        sn.SNOW_ROW_DDL)
    misses = sn.snow_cache_misses(
        pixels.filter(F.col("pixel_key") == "18:4:100:200"), stale, [(2023, 1)])
    fetched = sn.fetch_snow_updates(
        misses, lambda h, v, y, w, px: [(55, 2)] * len(px))
    cache = sn.updated_snow_cache(stale, fetched)
    rows = cache.collect()
    assert len(rows) == 1 and rows[0].snow == 55 and rows[0].cloud == 2


def test_fetch_policy_three_modes(spark, pixels, tmp_path):
    """Config.ts:13-17 policy switch: none = cache-only, incremental =
    top up cached pixels only (--fill-cache), full = runs-derived pixel
    universe.  Unknown policies raise like Config.ts:99-103."""
    calls = tmp_path / "calls"

    def fake_fetch(h, v, year, week, px):
        with open(calls, "a") as f:
            for row, col in px:
                f.write(f"{h}:{v}:{col}:{row}\n")
        return [(42, 0)] * len(px)

    # cache knows one pixel (stale week 2 missing); geometry adds two more
    cache = spark.createDataFrame(
        [("18:4:100:200", 2023, 1, 80, 0)], sn.SNOW_ROW_DDL)
    weeks = [(2023, 1), (2023, 2)]

    out_none = sn.fetch_snow_cover(pixels, cache, weeks, fake_fetch,
                                   policy="none")
    assert not calls.exists()                      # no fetch at all
    assert out_none.count() == cache.count()

    out_inc = sn.fetch_snow_cover(pixels, cache, weeks, fake_fetch,
                                  policy="incremental")
    assert out_inc.count() == 2                    # cached pixel × 2 weeks
    assert set(calls.read_text().splitlines()) == {"18:4:100:200"}
    assert {(r.pixel_key, r.week) for r in out_inc.collect()} == {
        ("18:4:100:200", 1), ("18:4:100:200", 2)}

    calls.unlink()
    out_full = sn.fetch_snow_cover(pixels, cache, weeks, fake_fetch,
                                   policy="full")
    assert out_full.count() == 6                   # 3 pixels × 2 weeks
    fetched_px = set(calls.read_text().splitlines())
    assert fetched_px == {"18:4:100:200", "18:4:101:200", "12:3:7:9"}
    # the settled (real-value) cell was not refetched
    kept = {(r.pixel_key, r.week): r.snow for r in out_full.collect()}
    assert kept[("18:4:100:200", 1)] == 80

    with pytest.raises(ValueError, match="Invalid snow cover fetch policy"):
        sn.fetch_snow_cover(pixels, cache, weeks, fake_fetch, policy="auto")


def test_produced_cache_feeds_snow_cover_history(spark):
    """End-to-end: geometry → pixels → fetch → cache → J7/A6 consumer.
    Error-code rows in the cache are transparently dropped by the
    consumer's validity filter."""
    geom = json.dumps({"type": "Point", "coordinates": [11.1164, 47.5581]})
    feats = spark.createDataFrame([("r1", geom)], "id string, geometry string")
    pixels = (feats.select(F.explode(
        en.geometry_viirs_pixels(F.col("geometry"))).alias("p"))
        .select(F.concat_ws(":", F.col("p")).alias("pixel_key")))

    empty = spark.createDataFrame([], sn.SNOW_ROW_DDL)
    misses = sn.snow_cache_misses(pixels, empty, [(2023, 1), (2023, 2)])

    def fake_fetch(h, v, year, week, px):
        if week == 2:
            return None  # missing week archives as 301
        return [(75, 0)] * len(px)

    cache = sn.updated_snow_cache(
        empty, sn.fetch_snow_updates(misses, fake_fetch))
    out = en.snow_cover_history(feats, cache).collect()
    assert len(out) == 1
    hist = out[0].snow_cover_history
    assert len(hist) == 1 and hist[0].year == 2023
    assert len(hist[0].days) == 1          # week 2's 301 row filtered out
    assert hist[0].days[0].avg_snow == 75
    assert hist[0].days[0].valid_pct == 100
