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


def streaming_curation_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental corpus curation — the streaming twin of
    ``pipeline/curation.py``: per-source verdict counts after an
    availableNow drain, computed from three cooperating streams over the
    same document source (stats are ORDER-FREE, so the drained result is
    exactly the batch answer regardless of which duplicate arrives
    first):

    - stateless flags (benchmark split, BIGINT quality gate) aggregate
      per source in complete mode;
    - cross-batch exact dedup state (``dropDuplicates`` on
      (source, digest) over the quality-passing pool) yields the unique
      count → duplicates = pool − unique;
    - decontamination joins the stream's word-5-grams against the
      STATIC benchmark shingle set (stream-static inner join, the
      standing-reference-table shape), then dedups (source, digest) so
      contaminated counts once per unique content.

    Output: (source, n_docs, n_benchmark, n_quality, n_dup,
    n_contaminated, n_kept).
    """
    from ..functions import text as T
    from ..pipeline.curation import BENCH_MOD, QUALITY_MIN_E6, SHINGLE_N

    schema = spark.read.parquet(f"{sf_dir}/documents.parquet").schema

    import os

    docs_path = f"{sf_dir}/documents.parquet"

    def stream():
        # the file-stream source requires a DIRECTORY basePath: stream the
        # table directory when documents.parquet is one (parts inside),
        # else glob the single file out of sf_dir (the testdata layout)
        if os.path.isdir(docs_path):
            return spark.readStream.schema(schema).parquet(docs_path)
        return (spark.readStream.schema(schema)
                .option("pathGlobFilter", "documents.parquet")
                .parquet(sf_dir))

    def flags(df):
        text = F.col("text")
        prepared = df.select(
            "doc_id", "source", "text",
            (F.col("doc_id") % BENCH_MOD == 0).alias("bench"),
            F.least(T.token_count(text).cast("long"),
                    F.lit(64).cast("long")).alias("__tok_c"),
            (F.length(text).cast("long")
             - F.length(F.regexp_replace(text, "[a-zA-Z0-9 ]", ""))
             .cast("long")).alias("__non_punct"),
            F.length(text).cast("long").alias("__len"))
        return prepared.withColumn(
            "q_ok",
            F.expr("CASE WHEN __len > 0 THEN "
                   "(__tok_c * __non_punct * 1000000L) div (64L * __len) "
                   f"ELSE 0L END") >= QUALITY_MIN_E6)

    def drain(df, mode="complete"):
        name = f"stream_curate_{uuid.uuid4().hex[:8]}"
        q = (df.writeStream.format("memory").queryName(name)
             .outputMode(mode).trigger(availableNow=True).start())
        q.awaitTermination()
        return spark.table(name)

    base = drain(flags(stream()).groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.when(F.col("bench"), 1).otherwise(0)).alias("n_benchmark"),
        F.sum(F.when(~F.col("bench") & ~F.col("q_ok"), 1).otherwise(0))
        .alias("n_quality"),
        F.sum(F.when(~F.col("bench") & F.col("q_ok"), 1).otherwise(0))
        .alias("n_pool")))

    pool = (flags(stream()).filter(~F.col("bench") & F.col("q_ok"))
            .select("source", F.md5("text").alias("digest")))
    uniq = drain(pool.dropDuplicates(["source", "digest"])
                 .groupBy("source").agg(F.count("*").alias("n_unique")))

    # static benchmark shingles from the same parquet (the standing
    # reference table a tail-follower would hold)
    bench_sh = (spark.read.parquet(f"{sf_dir}/documents.parquet")
                .filter(F.col("doc_id") % BENCH_MOD == 0)
                .select(F.explode(F.array_distinct(
                    T.word_shingles(T.words(F.col("text")), SHINGLE_N)))
                    .alias("shingle"))
                .distinct())
    cont_stream = (flags(stream())
                   .filter(~F.col("bench") & F.col("q_ok"))
                   .select("source", F.md5("text").alias("digest"),
                           F.explode(F.array_distinct(
                               T.word_shingles(T.words(F.col("text")),
                                               SHINGLE_N)))
                           .alias("shingle"))
                   .join(bench_sh, "shingle")
                   .dropDuplicates(["source", "digest"]))
    cont = drain(cont_stream.groupBy("source")
                 .agg(F.count("*").alias("n_contaminated")))

    return (base
            .join(uniq, "source", "left")
            .join(cont, "source", "left")
            .select(
                "source", "n_docs", "n_benchmark", "n_quality",
                (F.col("n_pool")
                 - F.coalesce("n_unique", F.lit(0))).alias("n_dup"),
                F.coalesce("n_contaminated", F.lit(0))
                .alias("n_contaminated"),
                (F.coalesce("n_unique", F.lit(0))
                 - F.coalesce("n_contaminated", F.lit(0)))
                .alias("n_kept")))
