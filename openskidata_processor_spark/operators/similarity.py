"""Similarity search over embedding columns (``array<float>``).

- ``knn_brute_force``: exact top-k by cosine.  The query side is broadcast
  (queries are almost always ≪ corpus), the corpus streams through a single
  codegen'd stage computing JVM-side dot products, and per-query top-k is a
  rank window.  At 100 TB this is the scan-everything baseline: one pass,
  no shuffle of the corpus itself, only of the (n_queries × corpus) scored
  pairs — which a pre-filter on an LSH/IVF bucket cuts down.
- ``lsh_ann_topk``: random-hyperplane LSH bucketing (the scale path).
  Plane tables are deterministic (seeded), built once, broadcast as
  literals.  Multi-probe = querying all buckets at Hamming distance ≤ 1
  from the query's code to recover recall lost at bucket boundaries.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vectors import as_double, cosine


def knn_brute_force(queries: DataFrame, corpus: DataFrame, k: int,
                    query_id: str = "query_id", corpus_id: str = "corpus_id",
                    query_vec: str = "qvec", corpus_vec: str = "cvec") -> DataFrame:
    """Exact cosine top-k: (query_id, rank, corpus_id, cosine_sim)."""
    scored = (
        F.broadcast(queries)
        .crossJoin(corpus)
        .select(
            F.col(query_id), F.col(corpus_id),
            cosine(as_double(F.col(query_vec)),
                   as_double(F.col(corpus_vec))).alias("cosine_sim"))
    )
    w = Window.partitionBy(query_id).orderBy(F.col("cosine_sim").desc(),
                                             F.col(corpus_id).asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(query_id, "rank", corpus_id, "cosine_sim"))


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    rng = np.random.RandomState(seed)
    return rng.randn(n_planes, dim).tolist()


def lsh_code(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-bit code of ``vec`` against fixed hyperplanes, packed to a long."""
    code = F.lit(0).cast("long")
    for j, plane in enumerate(planes):
        p = F.array(*[F.lit(float(x)) for x in plane])
        d = F.aggregate(F.zip_with(as_double(vec), p, lambda a, b: a * b),
                        F.lit(0.0), lambda acc, x: acc + x)
        code = code.bitwiseOR(
            F.when(d > 0, F.shiftleft(F.lit(1).cast("long"), j))
             .otherwise(F.lit(0).cast("long")))
    return code


def lsh_ann_topk(queries: DataFrame, corpus: DataFrame, k: int, dim: int,
                 n_planes: int = 12, multiprobe: bool = True,
                 query_id: str = "query_id", corpus_id: str = "corpus_id",
                 query_vec: str = "qvec", corpus_vec: str = "cvec") -> DataFrame:
    """Approximate top-k: bucket by hyperplane code, score within buckets.

    With multiprobe, each query also probes the ``n_planes`` buckets at
    Hamming distance 1 (flip one bit) — recall ~doubles for ~n× candidate
    cost, still ≪ brute force.
    """
    planes = _hyperplanes(dim, n_planes)
    c = corpus.withColumn("__bucket", lsh_code(F.col(corpus_vec), planes))
    q = queries.withColumn("__code", lsh_code(F.col(query_vec), planes))
    if multiprobe:
        probes = F.array(
            F.col("__code"),
            *[F.col("__code").bitwiseXOR(F.lit(1 << j)) for j in range(n_planes)])
        q = q.withColumn("__bucket", F.explode(probes))
    else:
        q = q.withColumn("__bucket", F.col("__code"))
    scored = (
        F.broadcast(q.drop("__code"))
        .join(c, "__bucket")
        .select(F.col(query_id), F.col(corpus_id),
                cosine(as_double(F.col(query_vec)),
                       as_double(F.col(corpus_vec))).alias("cosine_sim"))
        .dropDuplicates([query_id, corpus_id])
    )
    w = Window.partitionBy(query_id).orderBy(F.col("cosine_sim").desc(),
                                             F.col(corpus_id).asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(query_id, "rank", corpus_id, "cosine_sim"))
