"""Scale probe (manual, not a CI test): replicate the sf0.1 corpus 10×
(~50k documents / 500k embedding rows, ids shifted per replica — an
adversarial corpus where every document has 9 exact duplicates) and run
the dedup / ANN / hygiene families end to end.

Usage::

    python tests/scale_probe.py [workdir]

Duplication makes TRUE pair outputs grow quadratically (10 copies → 45
intra-group pairs), so pair counts ~1000× sf0.1 are the correct answer,
not blowup; the numbers to watch are wall times and that nothing falls
over.  Representative run (local[32], 2026-08):

    dedup_exact:             5.6s     knn_cosine:        5.1s
    dedup_minhash_lsh:      30.7s     ann_lsh_topk:      5.1s
    dedup_simhash:           3.8s     ann_ivf_topk:      2.9s
    dedup_ngram_jaccard:    67.0s     ann_pq_topk:       1.9s
    dedup_group_resolution: 74.0s     tfidf_doc_terms:   3.9s
    dedup_embedding_lsh:    46.5s     contamination:     5.1s
    pii/quality/passages/pack/shard: all ≤ 1.4s

ngram-Jaccard is the exact-oracle twin — at real corpus scale the
MinHash-LSH/SimHash paths (with ``max_doc_freq`` stop-shingle capping)
are the production dedup, and PQ/IVF are the production ANN.
"""

from __future__ import annotations

import os
import sys
import time


def build(workdir: str) -> None:
    import duckdb

    os.makedirs(workdir, exist_ok=True)
    con = duckdb.connect()
    src = "/root/testdata/sf0.1"
    con.execute(f"""
      COPY (SELECT doc_id + r * 10000000 AS doc_id, text, lang, source,
                   n_chars
            FROM read_parquet('{src}/documents.parquet'),
                 (SELECT unnest(generate_series(0, 9)) AS r))
      TO '{workdir}/documents.parquet' (FORMAT PARQUET)""")
    con.execute(f"""
      COPY (SELECT vec_id + r * 10000000 AS vec_id, embedding, label
            FROM read_parquet('{src}/embeddings.parquet'),
                 (SELECT unnest(generate_series(0, 9)) AS r))
      TO '{workdir}/embeddings.parquet' (FORMAT PARQUET)""")
    con.execute(f"""
      COPY (SELECT event_id + r * 100000000 AS event_id, ts,
                   user_id + r * 1000000 AS user_id, event_type, value,
                   props
            FROM read_parquet('{src}/events.parquet'),
                 (SELECT unnest(generate_series(0, 9)) AS r))
      TO '{workdir}/events.parquet' (FORMAT PARQUET)""")
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem"]:
        con.execute(f"COPY (SELECT * FROM read_parquet('{src}/{t}.parquet'))"
                    f" TO '{workdir}/{t}.parquet' (FORMAT PARQUET)")


QUERIES_TO_PROBE = [
    "dedup_exact", "dedup_minhash_lsh", "dedup_simhash",
    "dedup_ngram_jaccard", "dedup_group_resolution", "knn_cosine",
    "ann_lsh_topk", "ann_ivf_topk", "ann_pq_topk", "pii_redact_docs",
    "quality_repetition", "contamination_ngram", "dedup_passages",
    "pack_sequences", "pack_concat_bins", "shard_assignment",
    "tfidf_doc_terms", "dedup_embedding_lsh", "multimodal_audio_stats",
    "multimodal_video_stats", "rollup_multi_granularity",
    "sample_temperature_mixture", "sample_mixture_epochs",
    "vocab_top_terms", "heavy_hitters_sketch",
    # round-7 additions: the composed curation pipeline and its
    # single-pass streaming twin on the same duplication-skew corpus
    # (every doc has 9 exact duplicates — the dedup legs carry 90% of
    # the pool, the adversarial case for the keep-first window and the
    # cross-batch digest state)
    "curate_corpus", "stream_curate_stats",
    # round-7 additions: span/fingerprint dedup on the same corpus —
    # every doc has 9 exact duplicates, so TRUE pair/span outputs grow
    # quadratically (winnowing pairs ~45× per group); wall time and
    # not-falling-over are the signals
    "substring_dedup_spans", "winnow_fingerprint_pairs",
    "semantic_decontamination", "length_bucket_batches",
    "scd2_user_history", "zorder_file_stats",
    "multimodal_near_dup_groups", "stream_winnow_pairs",
    "profile_table_stats",
    # round-8 additions: web-ingestion + chunking + bloom families.
    # Measured at 10× (local[32], 2026-08): the per-row chains stay
    # flat — mojibake 0.4s, script 0.3s, blocklist 0.4s, chunk 2.5s,
    # html_extract 4.5s (md5 over the wrapped HTML dominates, linear);
    # url_canonical_stats 3.5s with canonical counts modulus-bounded
    # while n_urls grows 10×; profile_table_sketch 1.5s vs the exact
    # profile's 2.2s (the Expand removal).  bloom_decontaminate: 13.8s —
    # SLOWER here than the plain join, deliberately kept as the
    # adversarial datapoint: the word-soup corpus's tiny vocabulary
    # makes ~every training shingle a benchmark member, so the filter
    # admits ~100% and its 5 hashes/probe are pure overhead.  Bloom
    # pruning pays exactly when the big side is mostly NON-matching
    # (the real decontamination regime, where benchmark∩training is
    # rare); the no-false-negative contract keeps the answer exact in
    # both regimes.
    "html_extract_text", "url_canonical_stats", "mojibake_stats",
    "chunk_documents", "bloom_decontaminate", "blocklist_filter_docs",
    "script_stats", "profile_table_sketch",
    # lakehouse maintenance: stats-side only (≤4096 file rows at any SF)
    # lakehouse maintenance + sketch twin, measured at 10×:
    # file_skipping_stats 5.3s / compaction_plan 2.9s (both stats-side,
    # ≤4096 file rows at any SF) / quantiles_sketch 0.5s.
    "file_skipping_stats", "compaction_plan", "quantiles_sketch",
    # streaming LSH twin: 250,300 pairs at 10× (the correct quadratic
    # answer — every 10-copy duplicate group yields 45 pairs) in 22.2s,
    # UNDER the batch dedup_minhash_lsh's 30.7s on the same corpus —
    # the incremental plan never re-pairs standing documents.
    "stream_minhash_pairs",
    # dataset audits at 10×: oov_rate_docs 4.2s (broadcast vocab,
    # linear); source_overlap_matrix 11.2s for the full 20×20 matrix —
    # on this tiny-vocabulary corpus ~every shingle lives in every
    # source (the stop-shingle worst case the doc-frequency cap exists
    # for); output stays 190 rows regardless.
    "oov_rate_docs", "source_overlap_matrix",
]


def skew_probe() -> None:
    """Adversarial spatial skew: one mega-resort holding ~50% of all
    objects inside a single ~0.45 km grid cell (SURVEY §7 hard part (d)).

    Times the clustering dwithin self-join with the hot-cell salting
    enabled (production default) and disabled, at growing hot-cell
    sizes.  Representative run (local[32], 8g heap, 2026-08):

        hot cell   pairs    unsalted   salted (threshold 8000, S=8)
        8,000      52.8M    49.5s      66.5s   (below crossover)
        16,000     127M     181s       181s    (crossover)
        24,000     202M     377s       324s    (salted wins, gap grows
                                                quadratically with cell
                                                size; the unsalted serial
                                                join task is the bound)

    On a real cluster the unsalted path additionally funnels the whole
    pair stream through ONE node's shuffle disk, so the threshold is set
    at the measured local crossover, not above it.
    """
    import json as _json
    import time as _time

    from pyspark.sql import SparkSession, functions as F

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from openskidata_processor_spark.pipeline import clustering as cl

    spark = (SparkSession.builder.master("local[32]")
             .config("spark.driver.memory", "8g")
             .config("spark.sql.shuffle.partitions", "64").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    def corpus(n_hot, n_spread):
        rows = []
        for i in range(n_hot):       # all inside one ~0.0045° cell
            rows.append((f"h{i}", _json.dumps(
                {"type": "Point",
                 "coordinates": [10.0 + (i % 64) * 0.00006,
                                 47.0 + (i // 64) * 0.00006]})))
        for i in range(n_spread):    # background: one object per cell
            rows.append((f"s{i}", _json.dumps(
                {"type": "Point",
                 "coordinates": [20.0 + (i % 300) * 0.02,
                                 40.0 + (i // 300) * 0.02]})))
        return spark.createDataFrame(rows, "lid string, lgeom string")

    saved = cl.HOT_CELL_ROWS
    for n in (8000, 16000, 24000):
        left = corpus(n, n).cache()
        left.count()
        right = left.select(F.col("lid").alias("rid"),
                            F.col("lgeom").alias("rgeom"))
        for mode, thresh in (("salted", saved), ("unsalted", 10**9)):
            cl.HOT_CELL_ROWS = thresh
            t0 = _time.perf_counter()
            c = cl.dwithin_pairs(left, right, cl.MAX_DISTANCE_KM).count()
            print(f"{mode} hot={n}: pairs={c}, "
                  f"{round(_time.perf_counter() - t0, 1)}s", flush=True)
        left.unpersist()
    cl.HOT_CELL_ROWS = saved


def hot_bucket_probe() -> None:
    """Adversarial length skew for ``length_bucket_batches``: one
    token-length bucket (a truncation-cap length) holding ~50% of a
    10×-sized corpus.  Times the served two-phase ranking (sub-rank
    within (bucket, md5-prefix salt) + broadcast offsets) against the
    naive one-window-per-bucket plan and asserts row-identical output.

    Representative run (local[32], 2026-08, noop-write to defeat the
    count-only window pruning; hot bucket = half the corpus):

        corpus    two_phase   single_window
        2M        8.6s        4.2s    (below crossover — 1M rows sort
                                       fine in one beefy-node task)
        20M       19.1s       62.7s   (single window ranks 10M rows in
                                       ONE task; two_phase 3.3× faster
                                       and scaling ~linearly)

    On a real cluster the single-window plan additionally funnels the
    hot bucket through ONE node's shuffle disk while every other
    executor idles — the two-phase plan spreads it over 256 sub-ranges,
    so the production crossover sits far below the local one.
    """
    import time as _time

    from pyspark.sql import SparkSession, functions as F

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from openskidata_processor_spark.plans.hygiene import (
        _BUCKET_TOKENS, _batch_coords, _batch_coords_single_window)

    spark = (SparkSession.builder.master("local[32]")
             .config("spark.driver.memory", "8g")
             .config("spark.sql.shuffle.partitions", "64").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    n = 20_000_000
    # half the corpus at one cap length (bucket 4), half spread
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, F.lit(4 * _BUCKET_TOKENS))
        .otherwise((F.col("id") % 97 + 8).cast("long")).alias("n_tokens"),
        F.md5(F.col("id").cast("string")).alias("__h"))
    bucketed = docs.select(
        "doc_id", "n_tokens",
        (F.col("n_tokens") / _BUCKET_TOKENS).cast("long").alias("bucket"),
        "__h").cache()
    bucketed.count()
    for mode, fn in (("two_phase", _batch_coords),
                     ("single_window", _batch_coords_single_window)):
        t0 = _time.perf_counter()
        # noop WRITE, not count(): a bare count lets Catalyst prune the
        # unused window entirely and times an empty plan
        fn(bucketed).write.format("noop").mode("overwrite").save()
        dt = round(_time.perf_counter() - t0, 1)
        print(f"{mode}: {dt}s", flush=True)
    diff = (_batch_coords(bucketed)
            .exceptAll(_batch_coords_single_window(bucketed)).count())
    print(f"output identical: {diff == 0}", flush=True)
    bucketed.unpersist()


def main() -> None:
    if "--skew" in sys.argv:
        skew_probe()
        return
    if "--hot-bucket" in sys.argv:
        hot_bucket_probe()
        return
    workdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfbig"
    if not os.path.exists(f"{workdir}/documents.parquet"):
        build(workdir)

    from pyspark.sql import SparkSession

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from openskidata_processor_spark.plans import QUERIES

    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.shuffle.partitions", "64")
             .config("spark.driver.memory", "16g")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    for name in QUERIES_TO_PROBE:
        t0 = time.perf_counter()
        n = QUERIES[name](spark, workdir).count()
        print(f"{name}: {n} rows, {round(time.perf_counter() - t0, 1)}s",
              flush=True)


if __name__ == "__main__":
    main()
