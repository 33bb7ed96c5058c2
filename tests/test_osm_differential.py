"""Differential fuzz: the Catalyst tag expressions vs a clean-room Python
model of the reference semantics (Status.ts:9-58, OSMTransforms.ts:3-131).

The round-5 incident showed the formatter expressions can break in ways the
scenario fixtures miss (an ANSI throw on the *absence* of a match).  This
module generates hundreds of adversarial tag maps — lifecycle flags,
prefixed keys, value-tagging, unsupported states, noise, empty maps — and
checks ``status_and_value`` / ``osm_boolean`` / ``osm_number`` /
``osm_first_value`` / ``osm_name`` / ``osm_ref`` against an independent
pure-Python evaluation of the documented semantics, in ONE Spark job.

Seeded RNG, not hypothesis: Spark job startup dominates, so we want one
batch of many cases, deterministic across runs.
"""

from __future__ import annotations

import random
import re

import pytest
from pyspark.sql import functions as F

from openskidata_processor_spark.functions import osm

LIFECYCLE = list(osm.LIFECYCLE_STATES)
UNSUPPORTED = list(osm.UNSUPPORTED_STATES)
KEY = "aerialway"

# -- clean-room model of the reference semantics ---------------------------


def model_status_and_value(tags: dict, key: str):
    plain = tags.get(key)
    if plain in UNSUPPORTED or any(tags.get(s) == "yes" for s in UNSUPPORTED):
        return None, None
    flag = next((s for s in LIFECYCLE if tags.get(s) == "yes"), None)
    flag_status = flag or "operating"
    if plain is not None and plain in LIFECYCLE:
        return plain, tags.get(plain)
    if plain is not None:
        return flag_status, plain
    pstat = next((s for s in LIFECYCLE
                  if tags.get(f"{s}:{key}") is not None), None)
    if pstat is not None:
        return pstat, tags.get(f"{pstat}:{key}")
    return flag_status, None


def model_boolean(tags: dict, key: str):
    v = tags.get(key)
    return True if v == "yes" else False if v == "no" else None


def model_number(tags: dict, key: str):
    v = tags.get(key)
    if v is not None and re.fullmatch(r"-?[0-9]+(\.[0-9]+)?", v):
        return float(v)
    return None


def model_first_value(tags: dict, key: str):
    v = tags.get(key)
    return v.split(";")[0].strip() if v is not None else None


def model_ref(tags: dict):
    for k in ("piste:loc_ref", "piste:ref", "loc_ref", "ref"):
        if tags.get(k) is not None:
            return tags[k]
    return None


def model_name(tags: dict, root: str, fallback_root=None, ref=None):
    def values(r):
        keys = sorted(k for k in tags
                      if k == r or k.startswith(r + ":"))
        return [tags[k] for k in keys]

    vals = values(root)
    if fallback_root is not None and not vals:
        vals = values(fallback_root)
    joined = ", ".join(dict.fromkeys(vals))
    name = joined or None
    if ref is not None and name is not None:
        name = re.sub("^" + re.escape(ref) + r"(\s*-?\s+|-\s*)", "", name)
    return name


# -- adversarial tag-map generator -----------------------------------------

VALUES = (["yes", "no", "maybe", "", "t-bar", "chair_lift", "4", "-3.5",
           "12a", "a; b ;c", "x;y"] + LIFECYCLE + UNSUPPORTED)
NAMEISH = ["Home Run", "1a - Peak", "1a-Peak", "1a", "Peak (East)", "A, B"]
KEYS = ([KEY, "lit", "oneway", "capacity", "ref", "piste:ref", "loc_ref",
         "piste:loc_ref", "name", "name:en", "name:de", "piste:name",
         "noise", "website"]
        + LIFECYCLE + UNSUPPORTED
        + [f"{s}:{KEY}" for s in LIFECYCLE])


def gen_tags(rnd: random.Random) -> dict:
    n = rnd.randrange(0, 9)
    tags = {}
    for _ in range(n):
        k = rnd.choice(KEYS)
        pool = NAMEISH if k.startswith(("name", "piste:name")) else VALUES
        tags[k] = rnd.choice(pool)
    return tags


N_CASES = 600


@pytest.fixture(scope="module")
def cases_df(spark):
    rnd = random.Random(20260814)
    cases = [gen_tags(rnd) for _ in range(N_CASES)]
    # pin the empty map and the round-5 crasher shapes explicitly
    cases[0] = {}
    cases[1] = {KEY: "chair_lift"}
    cases[2] = {KEY: "proposed", f"proposed:{KEY}": "v"}
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(cases)],
        "i int, tags map<string,string>")
    return cases, df


def test_differential_against_python_model(cases_df):
    cases, df = cases_df
    tags = F.col("tags")
    status, value = osm.status_and_value(tags, KEY)
    got = {r["i"]: r for r in df.select(
        "i", status.alias("status"), value.alias("value"),
        osm.osm_boolean(tags, "lit").alias("lit"),
        osm.osm_boolean(tags, "oneway").alias("oneway"),
        osm.osm_number(tags, "capacity").alias("capacity"),
        osm.osm_first_value(tags, "website").alias("website"),
        osm.osm_ref(tags).alias("ref"),
        osm.osm_name(tags, "name", "piste:name",
                     osm.osm_ref(tags)).alias("name"),
    ).collect()}
    assert len(got) == N_CASES
    for i, t in enumerate(cases):
        r = got[i]
        exp_status, exp_value = model_status_and_value(t, KEY)
        assert (r["status"], r["value"]) == (exp_status, exp_value), (i, t)
        assert r["lit"] == model_boolean(t, "lit"), (i, t)
        assert r["oneway"] == model_boolean(t, "oneway"), (i, t)
        assert r["capacity"] == model_number(t, "capacity"), (i, t)
        assert r["website"] == model_first_value(t, "website"), (i, t)
        assert r["ref"] == model_ref(t), (i, t)
        assert r["name"] == model_name(t, "name", "piste:name",
                                       model_ref(t)), (i, t)
