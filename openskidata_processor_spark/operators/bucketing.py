"""Bucketed tables and co-located joins — the zero-shuffle path for the
engine's recurring fact⋈fact joins.

At 100 TB the dominant cost of J-class joins (membership, summary
resolution, dedup verify) is the shuffle of both sides on the join key.
Spark's bucketing removes it: write each side ``bucketBy(N, key)`` once,
and every subsequent equi-join on that key reads bucket-aligned splits —
SortMergeJoin with NO Exchange on either side (bucket count and key must
match).  The reference gets the same effect from PostGIS btree indexes
(`PostgreSQLClusteringDatabase.ts` — every hot join column is indexed);
bucketing is the Spark-native equivalent where the "index" is the physical
layout.

Usage shape::

    write_bucketed(lineitem, "li_b", path, ["l_orderkey"], 32)
    write_bucketed(orders,   "ord_b", path2, ["o_orderkey"], 32)
    spark.table("li_b").join(spark.table("ord_b"),
                             on=[...])   # planned without Exchange

``assert_no_shuffle`` exposes the plan check the tests (and a cluster
pre-flight) use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, path: str,
                   bucket_cols: list[str], num_buckets: int,
                   sort_cols: list[str] | None = None,
                   mode: str = "overwrite") -> None:
    """Persist ``df`` as a bucketed (and optionally per-bucket sorted)
    parquet table.  Sorting by the join key additionally removes the
    per-task Sort from SortMergeJoin reads."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    w = (df.write.mode(mode).format("parquet").option("path", path)
         .bucketBy(num_buckets, *bucket_cols))
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def executed_plan(df: DataFrame) -> str:
    """String form of the physical plan (post-AQE final plan when
    available) for shuffle audits."""
    return df._jdf.queryExecution().executedPlan().toString()


def assert_no_shuffle(df: DataFrame) -> None:
    """Raise if the physical plan contains an Exchange (shuffle).  The
    plan audit for co-located joins: run it on the joined DataFrame
    before launching a cluster-scale job."""
    plan = executed_plan(df)
    if "Exchange" in plan:
        raise AssertionError(f"plan contains a shuffle:\n{plan}")


def co_located_join(spark: SparkSession, left_table: str, right_table: str,
                    on, how: str = "inner") -> DataFrame:
    """Join two previously-bucketed tables.  With matching bucket counts
    and join keys the planner emits a shuffle-free SortMergeJoin."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
