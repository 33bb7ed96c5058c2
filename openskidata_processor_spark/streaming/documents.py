"""Structured Streaming over the documents corpus: incremental exact
deduplication.

A training-data pipeline at 100 TB doesn't re-dedup the whole corpus per
batch — it streams new documents against standing state.  This is the
streaming twin of ``operators.dedup.exact_duplicates``: content digests
(``md5(text)``) dedup with streaming state (``dropDuplicates`` keeps one
row per key across ALL micro-batches), then a per-source unique count in
complete mode.  Drained with ``Trigger.AvailableNow`` so the same code
path serves backfill (batch parity, DuckDB-oracle-checkable) and
tail-following.

State note: keyed on (source, digest) — global digest state would keep
whichever source arrived first, which is nondeterministic across
partitions; the composite key makes the drained result exactly the batch
answer.  At scale the state store shards on the digest (content-derived,
uniform); a production tail-follower adds a watermark on an event-time
column to bound state, which the documents table doesn't carry.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def streaming_exact_dedup_counts(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """Per-source unique-document counts via stateful streaming dedup.

    Output: (source, n_unique) — the final table after an availableNow
    drain equals ``SELECT source, count(DISTINCT md5(text)) GROUP BY 1``.
    """
    schema = spark.read.parquet(f"{sf_dir}/documents.parquet").schema
    stream = (spark.readStream.schema(schema)
              .option("pathGlobFilter", "documents.parquet")
              .parquet(sf_dir))
    deduped = (stream
               .select("source", F.md5("text").alias("digest"))
               .dropDuplicates(["source", "digest"]))
    agg = deduped.groupBy("source").agg(F.count("*").alias("n_unique"))
    name = f"stream_dedup_{uuid.uuid4().hex[:8]}"
    q = (agg.writeStream.format("memory").queryName(name)
         .outputMode("complete")
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    return spark.table(name)
