"""Structured Streaming operators over the events table.

The reference is strictly batch (SURVEY.md §2.11); this module is the
engine's streaming extension point.  The same windowed aggregation runs
either continuously (micro-batch with watermarked state) or as an
incremental catch-up batch via ``Trigger.AvailableNow`` — the pattern a
100 TB event pipeline uses for backfill + tail-following with one code path.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def windowed_event_counts(spark: SparkSession, sf_dir: str,
                          window: str = "1 hour",
                          watermark: str = "2 hours") -> DataFrame:
    """Tumbling-window counts per event_type, executed as a real streaming
    query (file source → watermarked window agg → memory sink) drained with
    availableNow.  Returns the final result table.

    Output: (window_start timestamp, event_type, n_events) — with an
    epoch-aligned window so a batch ``date_trunc`` oracle reproduces it.
    """
    from pyspark.sql.types import LongType

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    events_file = f"{sf_dir}/events.parquet"
    schema = spark.read.parquet(events_file).schema
    # The streaming file source wants a directory; glob-filter to the table.
    stream = (spark.readStream.schema(schema)
              .option("pathGlobFilter", "events.parquet")
              .parquet(sf_dir))
    if isinstance(schema["ts"].dataType, LongType):
        # Parquet TIMESTAMP(NANOS) read as long; exact integer ns → µs.
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    agg = (
        stream
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events")
    )
    name = f"stream_counts_{uuid.uuid4().hex[:8]}"
    q = (agg.writeStream.format("memory").queryName(name)
         .outputMode("complete")
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    return spark.table(name)
