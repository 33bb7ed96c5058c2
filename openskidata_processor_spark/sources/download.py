"""S1/S2 — Overpass and Skimap.org ingest (driver-side, like the reference:
downloading is I/O orchestration, not engine work; the engine's job starts
at the landing files).

Reference behavior (src/io/GeoJSONDownloader.ts:19-142,
src/io/DownloadURLs.ts:7-75, src/utils/overpassBBoxQuery.ts:3-13):
five Overpass QL queries (runs, lifts, ski areas, site relations, spots),
optionally bbox-clamped, fetched with retry/backoff from two endpoints;
Skimap.org ski areas fetched as GeoJSON and bbox-filtered.  Downloads land
as JSON files which ``spark.read.json`` + ``sources/osm.py`` consume.

Networking is gated behind an import-try: in offline environments the
query builders are still usable (and unit-testable) and ``download_all``
raises a clear error.
"""

from __future__ import annotations

import json
import os
import time

OVERPASS_TIMEOUT_S = 1800   # DownloadURLs.ts:9
RETRIES = 10                # GeoJSONDownloader.ts:121-142
RETRY_BACKOFF_S = 60

# The five element selections of the reference's data contract
# (DownloadURLs.ts:7-75), re-expressed.  {bbox} expands to the global
# "[bbox:south,west,north,east]" setting (overpassBBoxQuery.ts:3-13) or
# empty for planet-wide.  Lifecycle-prefixed keys the downstream status
# parser consumes (Status.ts) are selected explicitly.
_LIFECYCLE = ("disused", "abandoned", "proposed", "planned", "construction")

_LIFT_WAYS = "".join(f'way["{p}:aerialway"];' for p in _LIFECYCLE)
_AREA_SEL = "".join(f'wr["{p}:landuse"="winter_sports"];' for p in _LIFECYCLE)

QUERY_TEMPLATES: dict[str, str] = {
    # runs: every way/relation with a piste:type tag
    "runs": (
        '[out:json][timeout:{timeout}]{bbox};'
        'wr["piste:type"];'
        '(._;>;);out;'
    ),
    # lifts: aerialways incl. lifecycle prefixes, funiculars, and ONLY the
    # railways that are members of a site=piste relation -- not every
    # passenger railway on the planet (DownloadURLs.ts:16-33).
    "lifts": (
        '[out:json][timeout:{timeout}]{bbox};'
        'rel["site"="piste"];'
        '>>;'
        'way(r)["railway"]->.siterailways;'
        '((way["aerialway"];'
        + _LIFT_WAYS +
        'way["railway"="funicular"];'
        '.siterailways;);>;);'
        'out;'
    ),
    # ski areas: landuse=winter_sports incl. lifecycle-prefixed variants
    "ski_areas": (
        '[out:json][timeout:{timeout}]{bbox};'
        '(wr["landuse"="winter_sports"];'
        + _AREA_SEL +
        ');(._;>;);out;'
    ),
    "ski_area_sites": (
        '[out:json][timeout:{timeout}]{bbox};'
        'rel["site"="piste"];'
        'out;'
    ),
    # spots: dismount nodes; stations/transceivers/halfpipes as node OR
    # way (nw), transceivers filtered to training/checkpoint values
    # (DownloadURLs.ts:60-73).
    "spots": (
        '[out:json][timeout:{timeout}]{bbox};'
        '(node["piste:dismount"];'
        'nw["aerialway"="station"];'
        'nw["amenity"="avalanche_transceiver"]'
        '["avalanche_transceiver"="training"];'
        'nw["amenity"="avalanche_transceiver"]'
        '["avalanche_transceiver"="checkpoint"];'
        'nw["man_made"="piste:halfpipe"];);'
        '(._;>;);out;'
    ),
}

SKIMAP_URL = "https://skimap.org/SkiAreas/index.geojson"


def overpass_query(name: str, bbox: tuple[float, float, float, float] | None
                   = None, timeout_s: int = OVERPASS_TIMEOUT_S) -> str:
    """Build one of the five Overpass queries; ``bbox`` =
    (south, west, north, east) pushes the spatial predicate into the
    source — the reference's only manual pushdown (§4.1)."""
    if bbox:
        south, west, north, east = bbox
        norm = lambda lon: ((lon + 180.0) % 360.0) - 180.0  # noqa: E731
        clause = f"[bbox:{south},{norm(west)},{north},{norm(east)}]"
    else:
        clause = ""
    return QUERY_TEMPLATES[name].format(timeout=timeout_s, bbox=clause)


def download_all(landing_dir: str,
                 bbox: tuple[float, float, float, float] | None = None,
                 endpoint: str = "https://overpass-api.de/api/interpreter",
                 ) -> dict[str, str]:
    """Fetch all five Overpass layers + Skimap.org to ``landing_dir``;
    returns {name: path}.  Serial per endpoint with retry×10 / 60 s
    backoff, mirroring the reference's rate-limit etiquette."""
    try:
        from urllib.request import Request, urlopen
    except ImportError as e:  # pragma: no cover
        raise RuntimeError("networking unavailable in this environment") from e

    os.makedirs(landing_dir, exist_ok=True)
    out: dict[str, str] = {}
    for name in QUERY_TEMPLATES:
        path = os.path.join(landing_dir, f"input_{name}.osmjson")
        q = overpass_query(name, bbox)
        for attempt in range(RETRIES):
            try:
                req = Request(endpoint, data=("data=" + q).encode())
                with urlopen(req, timeout=OVERPASS_TIMEOUT_S) as r:
                    body = r.read()
                json.loads(body)  # fail early on partial downloads
                with open(path, "wb") as f:
                    f.write(body)
                break
            except Exception:
                if attempt == RETRIES - 1:
                    raise
                time.sleep(RETRY_BACKOFF_S)
        out[name] = path

    sk_path = os.path.join(landing_dir, "input_skimap_ski_areas.geojson")
    with urlopen(SKIMAP_URL, timeout=OVERPASS_TIMEOUT_S) as r:
        open(sk_path, "wb").write(r.read())
    out["skimap"] = sk_path
    return out
