"""Stable content-hash feature ids (reference P9).

The reference derives feature ids from an object hash of
``{type:"Feature", properties:{type}, geometry}``
(``src/transforms/FeatureBuilder.ts:4-21``) and re-hashes after topology
normalization.  We define our own canonical recipe (SURVEY.md §4.3 notes the
reference's exact bytes are library-internal): sha256 over a canonical JSON
of (feature_type, geometry), truncated to 32 hex chars.  Deterministic across
executors and runs — a requirement for distributed re-runs to be idempotent.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def feature_id(feature_type: Column | str, geometry_json: Column) -> Column:
    """id = substr(sha2(type || '|' || canonical_geometry, 256), 1, 32).

    ``geometry_json`` must already be canonical (the pipeline keeps geometry
    as the parsed-then-reserialized compact JSON string, so equal geometries
    have equal bytes).
    """
    t = F.lit(feature_type) if isinstance(feature_type, str) else feature_type
    return F.substring(F.sha2(F.concat_ws("|", t, geometry_json), 256), 1, 32)
