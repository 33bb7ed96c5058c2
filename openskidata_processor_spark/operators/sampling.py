"""Deterministic hash-based sampling — reproducible corpus subsetting.

``df.sample()`` is seeded per-partition, so the selected rows change
whenever the input's partitioning changes — useless for a 100 TB corpus
that must yield the SAME sample on every rerun, engine, and cluster layout.
The standard fix (used by every large-scale corpus pipeline) is to hash a
stable row key and keep rows whose hash falls below the fraction threshold:

    keep  ⇔  md5(salt ‖ key)[:4]  <  hex(floor(fraction · 16^4))

Properties that matter at scale:
- narrow transformation: no shuffle, no driver state, evaluated inside
  whole-stage codegen right after the scan (filter pushes to the row level);
- engine-portable: md5 of the UTF-8 key bytes is identical in Spark, DuckDB,
  or anything else, so a sample drawn here is reproducible elsewhere —
  which also makes it oracle-checkable;
- salt gives independent draws: disjoint salts → independent samples
  (e.g. train/validation splits that provably never overlap per salt pair
  when thresholds partition the hash space).

The 4-hex-digit prefix gives fraction granularity 1/65536 ≈ 0.0015%%, plenty
for split ratios; widen ``_PREFIX`` for finer control.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_PREFIX = 4  # hex digits of the md5 compared against the threshold


def _threshold(fraction: float) -> str:
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    raw = int(fraction * (16 ** _PREFIX))
    if raw >= 16 ** _PREFIX:
        # keep-all: the bound is exclusive, so return a supremum that every
        # hex prefix sorts below ('g' > 'f' > any hex digit)
        return "g"
    return format(raw, f"0{_PREFIX}x")


def _bucket(key: Column, salt: str) -> Column:
    return F.substring(F.md5(F.concat(F.lit(salt), key.cast("string"))),
                       1, _PREFIX)


def hash_sample(df: DataFrame, key: str | Column, fraction: float,
                salt: str = "") -> DataFrame:
    """Keep a deterministic ~``fraction`` of rows, selected by stable key."""
    key = F.col(key) if isinstance(key, str) else key
    return df.filter(_bucket(key, salt) < _threshold(fraction))


def stratified_hash_sample(df: DataFrame, key: str | Column, strata: str,
                           fractions: Mapping[str, float],
                           default: float = 0.0,
                           salt: str = "") -> DataFrame:
    """Per-stratum deterministic sampling: rows in stratum ``s`` survive
    with probability ``fractions[s]`` (``default`` for unlisted strata).
    Used for source-weighted corpus mixing (e.g. upsample curated sources,
    downsample crawl)."""
    thresh = F.lit(_threshold(default))
    for value, frac in sorted(fractions.items()):
        thresh = F.when(F.col(strata) == value,
                        F.lit(_threshold(frac))).otherwise(thresh)
    key = F.col(key) if isinstance(key, str) else key
    return df.filter(_bucket(key, salt) < thresh)
