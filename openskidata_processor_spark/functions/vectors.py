"""Vector math over ``array<float>`` embedding columns.

Everything here is a Catalyst higher-order-function expression — the dot
products and norms run JVM-side inside whole-stage codegen, so brute-force
similarity scans parallelize across executors with zero Python overhead.
Inputs are cast to ``array<double>`` first so results are bit-comparable with
a double-precision oracle (sequential left-to-right accumulation in both).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(vec: Column) -> Column:
    return vec.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """cosine = dot(a,b) / (|a| * |b|); computed exactly as the oracle does
    (dot / (sqrt(dot_aa) * sqrt(dot_bb))) for cross-engine reproducibility."""
    return dot(a, b) / (norm(a) * norm(b))
