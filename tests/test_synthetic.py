"""Synthetic resort-grid generator tests (the e2e bench fixture)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from openskidata_processor_spark.pipeline.prepare import prepare
from openskidata_processor_spark.sources.synthetic import resort_grid


def test_shapes_and_determinism(spark):
    a = resort_grid(spark, 7)
    b = resort_grid(spark, 7)
    assert set(a) == {"runs_raw", "lifts_raw", "ski_areas_raw",
                      "spots_raw", "sites", "skimap_areas"}
    assert a["runs_raw"].count() == 7 * 6
    assert a["lifts_raw"].count() == 7 * 2
    assert a["ski_areas_raw"].count() == 7
    assert a["spots_raw"].count() == 7
    assert a["sites"].count() == 2          # resorts 0, 5
    assert a["skimap_areas"].count() == 3   # resorts 0, 3, 6
    for k in a:
        left = sorted(map(str, a[k].collect()))
        right = sorted(map(str, b[k].collect()))
        assert left == right, k


def test_resorts_are_spatially_disjoint(spark):
    g = resort_grid(spark, 120)  # spans two grid rows
    pts = [json.loads(r.geometry)["coordinates"][0]
           for r in g["ski_areas_raw"].select("geometry").collect()]
    # polygons are 0.02° wide on a 0.1° grid — no two can touch
    assert len(set(round(p[0][0], 4) for p in pts)) >= 100


def test_prepare_over_grid(spark):
    """Full pipeline over a 3-resort grid: one OSM area per resort (the
    Skimap.org point merges into resort 0), plus resort 0's site area;
    every resort's objects stay within their own areas."""
    layers = prepare(spark, **resort_grid(spark, 3))
    sas = layers["ski_areas"].collect()
    names = sorted(r.name or "?" for r in sas)
    assert names == ["Resort 0", "Resort 0 site", "Resort 1", "Resort 2"]
    r0 = next(r for r in sas if (r.name or "") == "Resort 0")
    assert any(s.type == "skimap.org" for s in r0.sources)
    assert list(r0.activities) == ["downhill", "nordic"]
    assert r0.statistics is not None

    runs = layers["runs"].collect()
    assert len(runs) == 18
    by_resort = {}
    for r in runs:
        lon = json.loads(r.geometry)["coordinates"][0][0]
        by_resort.setdefault(round(lon, 1), set()).update(r.ski_areas)
    # no ski-area id shared between different resorts' runs
    vals = list(by_resort.values())
    assert len(vals) == 3
    assert not (vals[0] & vals[1]) and not (vals[1] & vals[2])

    spots = layers["spots"].collect()
    assert len(spots) == 3
    assert all(s.lift_id for s in spots)     # station snapped to its lift

    lifts = layers["lifts"].collect()
    assert len(lifts) == 6
    assert all(len(r.ski_areas) >= 1 for r in lifts)


def test_distributed_generation_plan(spark):
    """The generator must be mapInPandas over spark.range — never a
    driver-side collected list (a generator that doesn't scale would be
    the bottleneck of the benchmark it feeds)."""
    plan = resort_grid(spark, 5)["runs_raw"]._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Range" in plan
    assert "Scan ExistingRDD" not in plan
