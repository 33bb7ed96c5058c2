"""K3 — GeoPackage sink (src/io/GeoPackageWriter.ts:154-548), built on
stdlib sqlite3 against the published OGC GeoPackage 1.2 spec (no gpkg
library in this container).

Like the reference (a single-node library fed by streamed features), this
is a driver-side export: layer DataFrames are iterated per-partition and
inserted in one transaction with the reference's WAL/synchronous-off bulk
pragmas (GeoPackageWriter.ts:495-512).  Ski areas additionally export as
centroid points (:534-548).

Geometry encodes as the GPKG binary header (magic "GP", version, flags,
srs_id 4326) + little-endian WKB — implemented from the public WKB spec.
"""

from __future__ import annotations

import json
import os
import sqlite3
import struct
from typing import Any

from pyspark.sql import DataFrame

from ..functions.geometry import centroid as geom_centroid

_WKB_TYPE = {"Point": 1, "LineString": 2, "Polygon": 3,
             "MultiPoint": 4, "MultiLineString": 5, "MultiPolygon": 6,
             "GeometryCollection": 7}


def _wkb(geom: dict[str, Any]) -> bytes:
    t = geom["type"]
    code = _WKB_TYPE[t]
    out = [struct.pack("<BI", 1, code)]  # little endian + type

    def pt(p):
        return struct.pack("<dd", p[0], p[1])

    def ring(r):
        return struct.pack("<I", len(r)) + b"".join(pt(p) for p in r)

    c = geom.get("coordinates", [])
    if t == "Point":
        out.append(pt(c))
    elif t == "LineString":
        out.append(ring(c))
    elif t == "Polygon":
        out.append(struct.pack("<I", len(c)) + b"".join(ring(r) for r in c))
    elif t == "MultiPoint":
        out.append(struct.pack("<I", len(c)))
        out.extend(struct.pack("<BI", 1, 1) + pt(p) for p in c)
    elif t == "MultiLineString":
        out.append(struct.pack("<I", len(c)))
        out.extend(struct.pack("<BI", 1, 2) + ring(l) for l in c)
    elif t == "MultiPolygon":
        out.append(struct.pack("<I", len(c)))
        out.extend(struct.pack("<BI", 1, 3) + struct.pack("<I", len(poly))
                   + b"".join(ring(r) for r in poly) for poly in c)
    elif t == "GeometryCollection":
        geoms = geom.get("geometries", [])
        out.append(struct.pack("<I", len(geoms)))
        out.extend(_wkb(g) for g in geoms)
    return b"".join(out)


def gpkg_blob(geom: dict[str, Any], srs_id: int = 4326) -> bytes:
    """GPKG geometry blob: magic, version 0, flags (little-endian, no
    envelope), srs, then WKB."""
    header = b"GP" + bytes([0, 0b00000001]) + struct.pack("<i", srs_id)
    return header + _wkb(geom)


def _init_gpkg(con: sqlite3.Connection) -> None:
    con.executescript("""
    PRAGMA application_id = 0x47504B47;
    PRAGMA user_version = 10200;
    CREATE TABLE IF NOT EXISTS gpkg_spatial_ref_sys (
      srs_name TEXT NOT NULL, srs_id INTEGER PRIMARY KEY,
      organization TEXT NOT NULL, organization_coordsys_id INTEGER NOT NULL,
      definition TEXT NOT NULL, description TEXT);
    CREATE TABLE IF NOT EXISTS gpkg_contents (
      table_name TEXT PRIMARY KEY, data_type TEXT NOT NULL,
      identifier TEXT UNIQUE, description TEXT DEFAULT '',
      last_change DATETIME DEFAULT (strftime('%Y-%m-%dT%H:%M:%fZ','now')),
      min_x DOUBLE, min_y DOUBLE, max_x DOUBLE, max_y DOUBLE,
      srs_id INTEGER);
    CREATE TABLE IF NOT EXISTS gpkg_geometry_columns (
      table_name TEXT NOT NULL, column_name TEXT NOT NULL,
      geometry_type_name TEXT NOT NULL, srs_id INTEGER NOT NULL,
      z TINYINT NOT NULL, m TINYINT NOT NULL,
      CONSTRAINT pk_geom_cols PRIMARY KEY (table_name, column_name));
    """)
    con.execute("""INSERT OR IGNORE INTO gpkg_spatial_ref_sys VALUES
      ('WGS 84', 4326, 'EPSG', 4326,
       'GEOGCS["WGS 84",DATUM["WGS_1984",SPHEROID["WGS 84",6378137,298.257223563]],PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]]',
       NULL)""")
    con.execute("""INSERT OR IGNORE INTO gpkg_spatial_ref_sys VALUES
      ('undefined', -1, 'NONE', -1, 'undefined', NULL),
      ('undefined', 0, 'NONE', 0, 'undefined', NULL)""")


def write_geopackage(layers: dict[str, DataFrame], path: str,
                     geometry_col: str = "geometry",
                     ski_area_centroids: bool = True) -> None:
    """Write each layer DataFrame as a GPKG feature table.

    Array/struct columns serialize as JSON text (the reference flattens to
    typed text columns the same way for list-valued properties)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    if os.path.exists(path):
        os.remove(path)
    con = sqlite3.connect(path)
    # bulk pragmas (GeoPackageWriter.ts:495-512)
    con.execute("PRAGMA journal_mode = WAL")
    con.execute("PRAGMA synchronous = OFF")
    _init_gpkg(con)

    for name, df in layers.items():
        cols = [c for c in df.columns if c != geometry_col]
        col_defs = ", ".join(f'"{c}" TEXT' for c in cols)
        con.execute(f'CREATE TABLE "{name}" '
                    f'(fid INTEGER PRIMARY KEY AUTOINCREMENT, '
                    f'geom BLOB, {col_defs})')
        con.execute(
            "INSERT INTO gpkg_contents (table_name, data_type, identifier,"
            " srs_id) VALUES (?, 'features', ?, 4326)", (name, name))
        con.execute(
            "INSERT INTO gpkg_geometry_columns VALUES (?, 'geom',"
            " 'GEOMETRY', 4326, 0, 0)", (name,))

        placeholders = ", ".join(["?"] * (1 + len(cols)))
        insert = (f'INSERT INTO "{name}" (geom, '
                  + ", ".join(f'"{c}"' for c in cols)
                  + f") VALUES ({placeholders})")

        def encode(v):
            if v is None or isinstance(v, (str, int, float)):
                return v
            if isinstance(v, bool):
                return int(v)
            if hasattr(v, "asDict"):
                return json.dumps(v.asDict(recursive=True), sort_keys=True,
                                  default=str)
            if isinstance(v, (list, tuple)):
                return json.dumps(
                    [x.asDict(recursive=True) if hasattr(x, "asDict") else x
                     for x in v], sort_keys=True, default=str)
            if isinstance(v, dict):
                return json.dumps(v, sort_keys=True, default=str)
            return str(v)

        rows = df.select(geometry_col, *cols).toLocalIterator(prefetchPartitions=True)
        batch = []
        for r in rows:
            geom = json.loads(r[geometry_col])
            if ski_area_centroids and name == "ski_areas" \
                    and geom["type"] not in ("Point",):
                # ski areas export as centroid points (:534-548)
                geom = {"type": "Point", "coordinates": geom_centroid(geom)}
            batch.append((gpkg_blob(geom),)
                         + tuple(encode(r[c]) for c in cols))
            if len(batch) >= 5000:  # reference bulk batch size
                con.executemany(insert, batch)
                batch = []
        if batch:
            con.executemany(insert, batch)
    con.commit()
    con.close()


def merge_geopackages(paths: list[str], out_path: str) -> None:
    """K5 gpkg merge: INSERT OR IGNORE of every layer table
    (src/io/GeoPackageMerger.ts:32,175-177)."""
    import shutil
    shutil.copy(paths[0], out_path)
    con = sqlite3.connect(out_path)
    for p in paths[1:]:
        con.execute("ATTACH DATABASE ? AS src", (p,))
        tables = [r[0] for r in con.execute(
            "SELECT table_name FROM src.gpkg_contents")]
        for t in tables:
            cols = [r[1] for r in con.execute(f'PRAGMA table_info("{t}")')]
            non_fid = [c for c in cols if c != "fid"]
            collist = ", ".join(f'"{c}"' for c in non_fid)
            con.execute(f'INSERT OR IGNORE INTO "{t}" ({collist}) '
                        f'SELECT {collist} FROM src."{t}"')
        con.commit()
        con.execute("DETACH DATABASE src")
    con.close()
