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


def updated_cache(cache: DataFrame, fetched: DataFrame) -> DataFrame:
    """Cache ∪ newly fetched rows; existing keys win (the reference only
    fetches keys that missed, so collisions only occur between concurrent
    runs).  Both sides are (key, value) two-column tables."""
    fresh = fetched.toDF(*cache.columns).join(
        cache.select(cache.columns[0]), cache.columns[0], "left_anti")
    return cache.unionByName(fresh)
