"""Lake-layout parquet sink: partitioned, sorted, size-bounded output.

The reference's outputs are one-file export formats (GeoJSON/CSV/GPKG);
an engine feeding downstream Spark/DuckDB/Trino jobs at 100 TB instead
lands *tables*: hive-partitioned parquet with bounded file sizes and
within-file ordering.  This sink encodes the layout rules that make the
downstream scans cheap:

- **partition columns** become directory keys → partition pruning turns a
  `WHERE country = 'AT'` into a directory listing, no data read;
- **sortWithinPartitions** on the hot filter/join column gives parquet
  row-group min/max statistics real selectivity (predicate pushdown can
  skip row groups);
- **maxRecordsPerFile** bounds file size so a skewed partition writes N
  splittable files instead of one giant one;
- repartitioning on the partition columns BEFORE the write keeps each
  output directory to ~1 writer task's files, avoiding the
  tasks × partitions small-file explosion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(df: DataFrame, path: str,
                      partition_cols: list[str],
                      sort_cols: list[str] | None = None,
                      max_records_per_file: int | None = None,
                      mode: str = "overwrite") -> None:
    """Write ``df`` as a hive-partitioned parquet table."""
    out = df.repartition(*partition_cols)
    if sort_cols:
        out = out.sortWithinPartitions(*sort_cols)
    w = out.write.mode(mode).partitionBy(*partition_cols)
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", max_records_per_file)
    w.parquet(path)


def read_pruned(spark: SparkSession, path: str) -> DataFrame:
    """Read back a partitioned table.  Filters on partition columns prune
    directories at plan time — verify with
    ``df.filter(...).explain()`` showing ``PartitionFilters``."""
    return spark.read.parquet(path)
