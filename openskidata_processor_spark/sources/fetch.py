"""Remote-fetch stage for enrichment cache misses.

The reference resolves elevation/geocode/snow-cover cache misses with
batched HTTP clients (Elevation.ts:160-246 batchLoadElevations with
``maxBatchSize``; Geocoder.ts:111-208; snow-cover fetch_snow_data.py).
This engine exposes the miss sets as DataFrames
(``enrichment.elevation_cache_misses`` et al.); this module closes the
loop — a miss set in, new cache rows out — as an Arrow-batched
``mapInPandas`` stage:

- executors resolve keys in chunks of ``batch_size`` (the reference's
  ``maxBatchSize``, Elevation.ts:76): one request per chunk, not per key;
- a failed chunk yields NO rows — errors are never cached
  (Elevation.ts:215-229) and surface again as misses next run;
- successful null lookups ARE cached ("no data here" is knowledge,
  Elevation.ts:218);
- parallelism = partitions of the miss set; ``repartition(n)`` it first to
  bound concurrent requests against the server (per-task sequential
  chunks, n tasks in flight).

The fetcher is ANY callable ``fetch_batch(coords) -> list[float | None]``
with ``coords = [(lat, lon), ...]`` — tests inject a deterministic fake;
``racemap_fetcher`` builds the reference's racemap-protocol HTTP client
(Elevation.ts:282-299) lazily on the executor (stdlib urllib only).
"""

from __future__ import annotations

import json
from typing import Callable, Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FetchBatch = Callable[[list[tuple[float, float]]], list]

_BASE32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def geohash_decode(gh: str) -> tuple[float, float]:
    """Center (lat, lon) of a geohash cell — the inverse of
    enrichment.geohash_encode (public algorithm)."""
    lat_lo, lat_hi = -90.0, 90.0
    lon_lo, lon_hi = -180.0, 180.0
    even = True
    for c in gh:
        d = _BASE32.index(c)
        for j in range(4, -1, -1):
            bit = (d >> j) & 1
            if even:
                mid = (lon_lo + lon_hi) / 2
                if bit:
                    lon_lo = mid
                else:
                    lon_hi = mid
            else:
                mid = (lat_lo + lat_hi) / 2
                if bit:
                    lat_lo = mid
                else:
                    lat_hi = mid
            even = not even
    return (lat_lo + lat_hi) / 2, (lon_lo + lon_hi) / 2


def racemap_fetcher(url: str, timeout_s: float = 60.0) -> FetchBatch:
    """The reference's racemap elevation protocol: POST a JSON array of
    [lat, lon] pairs, receive a JSON array of elevations
    (Elevation.ts:282-299).  Built lazily so importing this module never
    touches the network."""
    def fetch(coords: list[tuple[float, float]]) -> list:
        import urllib.request
        req = urllib.request.Request(
            url, data=json.dumps([[la, lo] for la, lo in coords]).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=timeout_s) as resp:
            if resp.status != 200:
                raise RuntimeError(f"Failed status code: {resp.status}")
            return json.loads(resp.read())
    return fetch


def fetch_elevation_updates(misses: DataFrame, fetch_batch: FetchBatch,
                            batch_size: int = 500,
                            key_col: str = "key") -> DataFrame:
    """(key geohash) miss set → (key, elevation) cache rows, fetched in
    ``batch_size`` chunks per partition.  Failed chunks produce no rows."""
    def run(parts: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in parts:
            keys = list(pdf[key_col])
            for i in range(0, len(keys), batch_size):
                chunk = keys[i:i + batch_size]
                coords = [geohash_decode(k) for k in chunk]
                try:
                    values = fetch_batch(coords)
                    if len(values) != len(chunk):
                        raise RuntimeError(
                            f"fetched {len(values)} values for "
                            f"{len(chunk)} coordinates")
                except Exception:
                    continue  # errors are never cached (Elevation.ts:224)
                yield pd.DataFrame({
                    "key": chunk,
                    "elevation": [None if v is None else float(v)
                                  for v in values]})
    return misses.mapInPandas(run, "key string, elevation double")


GEOCODE_PLACE_DDL = ("struct<iso3166_1:string, iso3166_2:string, "
                     "country:string, region:string, locality:string>")

FetchOne = Callable[[float, float], "dict | None"]


# Minimal ISO-3166-2 region database, same shape as the reference's
# iso3166-2-db lookup (country alpha-2 → display name + region list with
# OSM-provider names).  The reference bundles the full public dataset;
# this built-in covers its unit vectors and the major ski countries —
# production callers pass a complete mapping via ``region_db``.  All codes
# and names are public ISO 3166 / OSM data.
DEFAULT_REGION_DB: dict = {
    "DE": {"iso": "DE", "name": "Germany", "regions": [
        {"name": "Bavaria", "iso": "BY"},
        {"name": "Baden-Württemberg", "iso": "BW"},
        {"name": "Saxony", "iso": "SN"},
    ]},
    "US": {"iso": "US", "name": "United States", "regions": [
        {"name": "California", "iso": "CA"},
        {"name": "Colorado", "iso": "CO"},
        {"name": "Utah", "iso": "UT"},
        {"name": "Vermont", "iso": "VT"},
        {"name": "Washington", "iso": "WA"},
    ]},
    "CZ": {"iso": "CZ", "name": "Czech Republic", "regions": [
        {"name": "Liberec Region", "iso": "LI"},
        {"name": "Hradec Králové Region", "iso": "KR"},
    ]},
    "JP": {"iso": "JP", "name": "Japan", "regions": [
        {"name": "Shimane Prefecture", "iso": "32"},
        {"name": "Nagano Prefecture", "iso": "20"},
        {"name": "Hokkaido", "iso": "01"},
    ]},
    "AT": {"iso": "AT", "name": "Austria", "regions": [
        {"name": "Tyrol", "iso": "7"},
        {"name": "Salzburg", "iso": "5"},
    ]},
    "CH": {"iso": "CH", "name": "Switzerland", "regions": [
        {"name": "Valais", "iso": "VS"},
        {"name": "Grisons", "iso": "GR"},
    ]},
    "FR": {"iso": "FR", "name": "France", "regions": [
        {"name": "Auvergne-Rhône-Alpes", "iso": "ARA"},
    ]},
    "IT": {"iso": "IT", "name": "Italy", "regions": [
        {"name": "Trentino-South Tyrol", "iso": "32"},
        {"name": "Aosta Valley", "iso": "23"},
    ]},
    "CA": {"iso": "CA", "name": "Canada", "regions": [
        {"name": "British Columbia", "iso": "BC"},
        {"name": "Alberta", "iso": "AB"},
        {"name": "Quebec", "iso": "QC"},
    ]},
}


def enhance_photon(props: "dict | None", region_db: dict | None = None):
    """enhancePhoton (Geocoder.ts:268-333): photon feature properties →
    the engine's place struct, or None when not geocodable.

    Exact reference branch order: no countrycode → null; country missing
    from the db but code ``XK`` → hardcoded Kosovo entry (iso3166_2 null,
    locality kept); country missing otherwise → null (invalid country);
    region resolved by ``state`` name first, falling back to ``county``
    (:306-321); unresolvable region → place WITH null iso3166_2/region.
    Country/region display names come from the region db, NOT from the
    photon response (:326-330)."""
    db = DEFAULT_REGION_DB if region_db is None else region_db
    props = props or {}
    code = props.get("countrycode")
    if not code:
        return None
    country = db.get(code)
    if country is None and code == "XK":
        # Kosovo is not in the iso3166-2-db dataset (Geocoder.ts:284-301)
        return {"iso3166_1": "XK", "iso3166_2": None, "country": "Kosovo",
                "region": None, "locality": props.get("city")}
    if country is None:
        return None
    region = None
    if props.get("state") is not None:
        region = next((r for r in country["regions"]
                       if r["name"] == props["state"]), None)
    if region is None and props.get("county") is not None:
        region = next((r for r in country["regions"]
                       if r["name"] == props["county"]), None)
    return {
        "iso3166_1": country["iso"],
        "iso3166_2": f"{country['iso']}-{region['iso']}" if region else None,
        "country": country["name"],
        "region": region["name"] if region else None,
        "locality": props.get("city"),
    }


def photon_fetcher(url: str, timeout_s: float = 60.0,
                   region_db: dict | None = None) -> FetchOne:
    """The reference's photon geocoding request (Geocoder.ts:219-253): one
    GET per geohash center with ``?lon=&lat=&lang=en&limit=1&radius=5``,
    mapped through ``enhance_photon`` (state/county → ISO-3166-2 via the
    region db, Kosovo special case, invalid-country null).  Built lazily:
    importing never touches the network."""
    def fetch(lat: float, lon: float):
        import urllib.parse
        import urllib.request
        q = urllib.parse.urlencode(
            {"lon": lon, "lat": lat, "lang": "en", "limit": 1, "radius": 5})
        req = urllib.request.Request(
            f"{url}?{q}", headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=timeout_s) as resp:
            if resp.status != 200:
                raise RuntimeError(f"Failed status code: {resp.status}")
            body = json.loads(resp.read())
        feats = body.get("features") or []
        if not feats:
            return None  # a successful "no place here" IS cached
        return enhance_photon(feats[0].get("properties"), region_db)
    return fetch


def fetch_geocode_updates(misses: DataFrame, fetch_one: FetchOne,
                          batch_size: int = 1000,
                          max_concurrent: int = 4,
                          max_errors: int = 100,
                          retry_delay_s: float = 2.0,
                          key_col: str = "key") -> DataFrame:
    """Geocode cache misses → (key, place) cache rows, with the reference
    client's request envelope (Geocoder.ts:66-100,111-208):

    - keys drain in batches of ``batch_size`` (DataLoader maxBatchSize
      1000, :97) — the batch bounds how much work is lost to an abort;
    - global concurrency ≤ ``max_concurrent`` in-flight requests
      (semaphore(4), :75,79): the miss set repartitions to that many
      partitions, each task fetching sequentially;
    - a failed request retries ONCE after ``retry_delay_s``
      (rawGeocodeRemoteWithRetry, :197-207);
    - an error-budget abort: ``max_errors`` *consecutive* failures stop
      remote fetching for the rest of the task ("Too many errors, not
      trying remote", :170); the counter resets to 0 on any success
      (:177).  Skipped/failed keys yield no rows — errors are never
      cached and surface as misses next run;
    - a successful null geocode ("no place here") IS cached as a null
      place (enhancePhoton returning null, :268-275).
    """
    out_schema = f"key string, place {GEOCODE_PLACE_DDL}"

    def run(parts: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import time as _time
        errors = 0
        for pdf in parts:
            keys = list(pdf[key_col])
            for i in range(0, len(keys), batch_size):
                rows = []
                for k in keys[i:i + batch_size]:
                    if errors >= max_errors:
                        break  # budget exhausted: stay local-only
                    lat, lon = geohash_decode(k)
                    try:
                        place = fetch_one(lat, lon)
                    except Exception:
                        _time.sleep(retry_delay_s)
                        try:
                            place = fetch_one(lat, lon)
                        except Exception:
                            errors += 1
                            continue
                    errors = 0
                    rows.append({"key": k, "place": place})
                if rows:
                    yield pd.DataFrame(rows)

    return misses.repartition(max_concurrent).mapInPandas(run, out_schema)


def geocode_cache_misses(features: DataFrame, cache: DataFrame,
                         sample_interval_km: float = 1.0,
                         geohash_precision: int = 6,
                         geometry_col: str = "geometry") -> DataFrame:
    """Distinct geohash-6 keys along all feature geometries (the same 1 km
    walk ``add_places`` joins on) not yet in the geocode cache."""
    from ..pipeline.enrichment import geometry_geohashes

    keys = (features.select(
        F.explode(geometry_geohashes(
            sample_interval_km, geohash_precision)(F.col(geometry_col)))
        .alias("key")).distinct())
    return keys.join(cache.select(F.col(cache.columns[0]).alias("key")),
                     "key", "left_anti")


def updated_cache(cache: DataFrame, fetched: DataFrame) -> DataFrame:
    """Cache ∪ newly fetched rows; existing keys win (the reference only
    fetches keys that missed, so collisions only occur between concurrent
    runs).  Both sides are (key, value) two-column tables."""
    fresh = fetched.toDF(*cache.columns).join(
        cache.select(cache.columns[0]), cache.columns[0], "left_anti")
    return cache.unionByName(fresh)
