"""Synthetic resort-grid generator for end-to-end pipeline benchmarks.

The reference's primary workload is not a single operator but the whole
``prepare()`` graph — formatters → site joins → run normalization →
10-pass clustering → statistics (its own perf artifact is the phase
timeline, src/clustering/PerformanceMonitor.ts:32-120).  To benchmark
that graph at controlled sizes, ``resort_grid`` deterministically
synthesizes N self-contained resorts on a lon/lat grid, each with the
object mix a real resort has:

- one ``landuse=winter_sports`` polygon (~2 km square)
- ``runs_per`` piste ways inside it (mostly downhill with cycling
  difficulties; the last one nordic)
- ``lifts_per`` aerialway ways inside it
- one station node within 30 m of the first lift's base
- every 3rd resort: a Skimap.org point area inside the polygon (merges
  into the OSM area in clustering pass 4)
- every 5th resort: a ``site=piste`` relation holding the first run (a
  minority member, so the polygon survives the site-overlap rule)

Resorts are spaced 0.1° apart (≈7–11 km), far beyond every clustering
radius, so output size scales exactly linearly with ``n_resorts`` and
the connected-components rounds stay bounded by a single resort's
diameter — which is precisely the property the benchmark verifies at
1× vs 10×.

Generation is distributed (``spark.range`` over resort ids →
``mapInPandas``), not a driver-side list: at benchmark sizes this is
cosmetic, at cluster scale it is the difference between a generator and
a bottleneck.  Everything is modular arithmetic on the resort id — no
RNG — so two invocations produce byte-identical inputs.
"""

from __future__ import annotations

import json
from typing import Callable, Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession

BRONZE_DDL = ("osm_type string, osm_id long, tags map<string,string>, "
              "geometry string")
SITES_DDL = ("site_id long, tags map<string,string>, "
             "members array<struct<type:string,ref:long,role:string>>")
SKIMAP_DDL = ("id string, name string, status string, "
              "activities array<string>, scalerank int, "
              "official_website string, geometry string")

_DIFFICULTIES = ("easy", "intermediate", "advanced")


def _origin(i: int) -> tuple[float, float]:
    return (-60.0 + (i % 100) * 0.1, 44.0 + (i // 100) * 0.1)


def _line(lon: float, lat0: float, lat1: float) -> str:
    return json.dumps({"type": "LineString",
                       "coordinates": [[lon, lat0], [lon, lat1]]})


def _point(lon: float, lat: float) -> str:
    return json.dumps({"type": "Point", "coordinates": [lon, lat]})


def _polygon(lon0: float, lat0: float, lon1: float, lat1: float) -> str:
    return json.dumps({"type": "Polygon", "coordinates": [[
        [lon0, lat0], [lon1, lat0], [lon1, lat1], [lon0, lat1],
        [lon0, lat0]]]})


def _per_resort(spark: SparkSession, n: int, fn: Callable, ddl: str,
                ) -> DataFrame:
    def gen(parts: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in parts:
            rows = [row for i in pdf["id"] for row in fn(int(i))]
            if rows:
                yield pd.DataFrame(rows)

    base = spark.range(n).repartition(min(max(n, 1), 64))
    return base.mapInPandas(gen, ddl)


def resort_grid(spark: SparkSession, n_resorts: int, runs_per: int = 6,
                lifts_per: int = 2) -> dict[str, DataFrame]:
    """The six ``prepare()`` inputs for a grid of ``n_resorts`` resorts."""

    def runs(i: int):
        lon0, lat0 = _origin(i)
        out = []
        for k in range(runs_per):
            tags = {"piste:type": "nordic" if k == runs_per - 1
                    else "downhill",
                    "name": f"Resort {i} run {k}"}
            if k < runs_per - 1:
                tags["piste:difficulty"] = _DIFFICULTIES[k % 3]
            if (i + k) % 4 == 0:
                tags["piste:snowmaking"] = "yes"
            out.append({"osm_type": "way", "osm_id": i * 100 + k,
                        "tags": tags,
                        "geometry": _line(lon0 + 0.002 + k * 0.002,
                                          lat0 + 0.002, lat0 + 0.012)})
        return out

    def lifts(i: int):
        lon0, lat0 = _origin(i)
        return [{"osm_type": "way", "osm_id": 10_000_000 + i * 100 + k,
                 "tags": {"aerialway": "chair_lift" if k % 2 else "t-bar",
                          "name": f"Resort {i} lift {k}"},
                 "geometry": _line(lon0 + 0.0015 + k * 0.004,
                                   lat0 + 0.002, lat0 + 0.012)}
                for k in range(lifts_per)]

    def areas(i: int):
        lon0, lat0 = _origin(i)
        return [{"osm_type": "way", "osm_id": 20_000_000 + i,
                 "tags": {"landuse": "winter_sports",
                          "name": f"Resort {i}"},
                 "geometry": _polygon(lon0, lat0, lon0 + 0.02,
                                      lat0 + 0.02)}]

    def spots(i: int):
        lon0, lat0 = _origin(i)
        return [{"osm_type": "node", "osm_id": 30_000_000 + i,
                 "tags": {"aerialway": "station",
                          "name": f"Resort {i} base"},
                 "geometry": _point(lon0 + 0.0016, lat0 + 0.00205)}]

    def sites(i: int):
        if i % 5:
            return []
        return [{"site_id": 40_000_000 + i,
                 "tags": {"site": "piste", "name": f"Resort {i} site"},
                 "members": [{"type": "way", "ref": i * 100, "role": ""}]}]

    def skimap(i: int):
        if i % 3:
            return []
        lon0, lat0 = _origin(i)
        return [{"id": f"sm{i}", "name": f"Resort {i} (Skimap)",
                 "status": "operating", "activities": ["downhill"],
                 "scalerank": 1 + i % 5,
                 "official_website": (f"https://example.org/r{i}"
                                      if i % 6 == 0 else None),
                 "geometry": _point(lon0 + 0.01, lat0 + 0.01)}]

    return {
        "runs_raw": _per_resort(spark, n_resorts, runs, BRONZE_DDL),
        "lifts_raw": _per_resort(spark, n_resorts, lifts, BRONZE_DDL),
        "ski_areas_raw": _per_resort(spark, n_resorts, areas, BRONZE_DDL),
        "spots_raw": _per_resort(spark, n_resorts, spots, BRONZE_DDL),
        "sites": _per_resort(spark, n_resorts, sites, SITES_DDL),
        "skimap_areas": _per_resort(spark, n_resorts, skimap, SKIMAP_DDL),
    }
