"""Explicit skew mitigation: salted joins and two-phase aggregation.

AQE's skew-join split (enabled in ``session.get_spark``) handles most
runtime skew, but two shapes still need manual salting at 100 TB:

- **salted_join** — a fact table whose hot keys each exceed what one task
  can sort (AQE splits the *partition*, but a single key's rows still
  meet one copy of the build side).  Salting scatters every fact row
  into ``n_salts`` sub-keys and replicates the (small but
  non-broadcastable) dimension side once per salt, so a hot key's rows
  spread over ``n_salts`` tasks.
- **salted_aggregate** — high-cardinality-per-key aggregation (e.g.
  counting occurrences of a viral document digest).  Phase 1 aggregates
  per (key, salt) — the map-side-combine effect materialized as an
  explicit stage; phase 2 merges the ≤ ``n_salts`` partials per key.

Salts are content-derived (``xxhash64`` of the row), never random:
deterministic under task retry and replay, which ``rand()``-based salting
is not (a retried task would re-salt differently and double-count).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_PHASE1 = {"count": F.count, "sum": F.sum, "min": F.min, "max": F.max}
_PHASE2 = {"count": F.sum, "sum": F.sum, "min": F.min, "max": F.max}


def _row_salt(df: DataFrame, n_salts: int) -> Column:
    return F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]),
                  F.lit(n_salts))


_SALTED_HOW = {"inner", "left", "leftouter", "left_outer",
               "left_semi", "leftsemi", "left_anti", "leftanti"}


def salted_join(fact: DataFrame, dim: DataFrame, on: list[str],
                n_salts: int = 16, how: str = "inner") -> DataFrame:
    """Equi-join with the fact side scattered over ``n_salts`` sub-keys
    and the dimension side replicated per salt.  Result equals
    ``fact.join(dim, on, how)``; only the physical distribution differs
    (hot keys occupy ``n_salts`` tasks instead of one).

    ``how`` is restricted to fact-preserving joins ({inner, left,
    left_semi, left_anti}): the dim side is replicated once per salt, so
    a right/full outer join would emit each unmatched dim row
    ``n_salts`` times — equality with the unsalted join breaks.  For
    those, salt the other side or dedupe unmatched rows explicitly."""
    if how.lower().replace("_", "") not in {
            h.replace("_", "") for h in _SALTED_HOW}:
        raise ValueError(
            f"salted_join: how={how!r} unsupported — the replicated dim "
            f"side would duplicate unmatched right rows {n_salts}×; use "
            f"one of inner/left/left_semi/left_anti")
    salted_fact = fact.withColumn("__salt", _row_salt(fact, n_salts))
    replicated = dim.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)])))
    return (salted_fact.join(replicated, on + ["__salt"], how)
            .drop("__salt"))


def salted_aggregate(df: DataFrame, keys: list[str],
                     aggs: dict[str, tuple[str, str]],
                     n_salts: int = 16) -> DataFrame:
    """Two-phase aggregation: ``aggs`` maps output name → (fn, column)
    with fn in {count, sum, min, max} (the decomposable kernel; avg =
    sum/count composed by the caller).  Phase 1 shuffles on (keys, salt)
    so no single reducer owns a hot key's full row set."""
    for name, (fn, _) in aggs.items():
        if fn not in _PHASE1:
            raise ValueError(f"{name}: {fn!r} is not decomposable "
                             f"(supported: {sorted(_PHASE1)})")
    salted = df.withColumn("__salt", _row_salt(df, n_salts))
    partial = salted.groupBy(*keys, "__salt").agg(*[
        _PHASE1[fn](F.lit(1) if col == "*" else F.col(col)).alias(name)
        for name, (fn, col) in aggs.items()])
    return partial.groupBy(*keys).agg(*[
        _PHASE2[fn](F.col(name)).alias(name)
        for name, (fn, _) in aggs.items()])
