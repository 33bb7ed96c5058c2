"""K1 — GeoJSON FeatureCollection sink (src/transforms/FeatureCollection.ts).

Features serialize as one JSON object per row (Catalyst ``to_json`` — no
Python in the per-row path), ordered by id for byte-reproducible output
(O1, PostgreSQLClusteringDatabase.ts:551).  Two shapes:

- ``write_feature_collection``: the reference's single-file
  ``{"type": "FeatureCollection", "features": [...]}`` — collectable
  because it is an *export* format; the driver streams partitions.
- ``write_feature_jsonl``: the scale shape — sharded JSON-lines of
  Feature objects (one spark text write, no driver bottleneck); the K5
  merge of N such directories is a plain ``unionByName``.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def feature_json(df: DataFrame, geometry_col: str = "geometry",
                 id_col: str = "id") -> DataFrame:
    """One canonical GeoJSON Feature string per row (column ``feature``),
    plus the id for ordering."""
    prop_cols = [c for c in df.columns if c not in (geometry_col,)]
    # the reference serializes null properties explicitly
    # ("access": null, "bearing": null, ... in every snapshot)
    props = F.to_json(F.struct(*[F.col(c) for c in prop_cols]),
                      {"ignoreNullFields": "false"})
    feature = F.concat(
        F.lit('{"type":"Feature","properties":'), props,
        F.lit(',"geometry":'), F.col(geometry_col), F.lit("}"))
    return df.select(F.col(id_col).alias("__id"), feature.alias("feature"))


def write_feature_jsonl(df: DataFrame, path: str,
                        geometry_col: str = "geometry") -> None:
    """Sharded newline-delimited Features (the 100 TB shape)."""
    feature_json(df, geometry_col).select("feature").write.mode(
        "overwrite").text(path)


def write_feature_collection(df: DataFrame, path: str,
                             geometry_col: str = "geometry") -> None:
    """Single FeatureCollection file, id-ordered (reference parity)."""
    rows = (feature_json(df, geometry_col)
            .orderBy("__id")
            .select("feature")
            .toLocalIterator())
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        f.write('{"type":"FeatureCollection","features":[')
        for i, r in enumerate(rows):
            if i:
                f.write(",")
            f.write(r.feature)
        f.write("]}")


def read_feature_collection(spark, path: str) -> DataFrame:
    """Streaming-shaped reader for FeatureCollection files (S4): features
    land as JSON strings, one row each."""
    with open(path) as f:
        fc = json.load(f)
    feats = [(json.dumps(x, separators=(",", ":"), sort_keys=True),)
             for x in fc.get("features", [])]
    return spark.createDataFrame(feats or [("",)], "feature string") \
        .filter(F.col("feature") != "")
