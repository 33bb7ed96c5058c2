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


def build(workdir: str, replicas: int = 10) -> None:
    import duckdb

    os.makedirs(workdir, exist_ok=True)
    con = duckdb.connect()
    src = "/root/testdata/sf0.1"
    con.execute(f"""
      COPY (SELECT doc_id + r * 10000000 AS doc_id, text, lang, source,
                   n_chars
            FROM read_parquet('{src}/documents.parquet'),
                 (SELECT unnest(generate_series(0, {replicas - 1})) AS r))
      TO '{workdir}/documents.parquet' (FORMAT PARQUET)""")
    if replicas != 10:
        return     # the larger corpora serve the bloom probe only
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
    # profile's 2.2s (the Expand removal).  bloom_decontaminate was
    # reworked in round 9 (fixed 200-doc benchmark slice, 5-gram
    # shingles, count-sized bitmap, one-xxhash64 probe, cached bench
    # frame); its dedicated regime probe is ``--bloom`` below and its
    # shuffle-volume contract is CI-pinned in tests/test_bloom.py.
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
    # round-9 additions, measured at 10× (local[32], 2026-08):
    # lang_id_confusion 13.9s — 12.7M scored trigram rows after the
    # arrays_zip vectorization (was 30.7s per-index); the model side is
    # bounded by the FEATURE space, corpus growth only adds scoring
    # rows.  line_dedup_docs 3.1s — the replica corpus makes EVERY
    # line ≥10-frequent, the adversarial all-boilerplate case (most
    # docs rebuild to ""), and the duplicate-group windows stay flat.
    "lang_id_confusion", "line_dedup_docs",
    # round-9 tokenizer family at 10×: the corpus→vocab collapse does
    # exactly what it promises — the replica corpus has the SAME
    # distinct-word vocab (10× frequencies), so bpe_pair_stats and
    # every bpe_learn_merges iteration run on an UNCHANGED frame; only
    # the one corpus-scale word scan grows.  Measured (local[32],
    # 2026-08): bpe_pair_stats 1.1s → 1.2s, bpe_learn_merges FLAT at
    # 8-11s both scales (the 8 sequential argmax/delta rounds are a
    # data-independent job-latency floor, ~1s each on local mode; at
    # cluster scale the same 8 rounds amortize over real data),
    # pmi_collocations 1.4s → 4.3s (the bigram COUNT pass is
    # corpus-scale/linear; the post-agg join frame is vocab-bounded),
    # split_holdout_stats 0.8s → 1.3s (pure per-row chain, linear).
    "bpe_pair_stats", "bpe_learn_merges", "pmi_collocations",
    "split_holdout_stats",
    # train-then-apply + composed prep at 10× (local[32], 2026-08):
    # bpe_encode_stats 4.9s → 6.1s, training_corpus_stats 6.3s → 7.7s —
    # the learned-merge job floor is flat, only the corpus-scale word
    # and hygiene passes add the ~1.3s delta at 10× data.
    "bpe_encode_stats", "training_corpus_stats",
    # streaming vocab-ledger twin: 2.3s → 4.2s (the delta is the one
    # corpus-scale word groupBy per micro-batch; the ledger drain and
    # pair compute stay vocab-sized)
    "stream_bpe_pair_stats",
    # round-10 additions, measured at 10× (local[32], 2026-08; sf0.1
    # first readings carry the session's one-time codegen):
    # bpe_learn_deep 8.8s → 2.2s — FLAT once warm: the vocab is
    # unchanged at 10× and the whole merge loop is one vocab-sized
    # applyInPandas task, so only the corpus word scan grows; the
    # batched bpe_learn_merges inherits the same flat property
    # (11.7s → 13.2s) with ~half the driver rounds of the r9 sequential
    # loop.  unigram family — seed 1.3s → 1.9s (the corpus word scan is
    # the only growing stage), train 5.3s → 7.5s (same scan, then EM on
    # the UNCHANGED vocab frame with model-sized collects), encode
    # 3.6s → 3.3s (flat).  stream_ivf_index 3.6s → 3.7s — 10× embedding
    # rows through the frozen broadcast model; per-batch work is
    # new-rows-only and the posting rollup is cell-bounded.
    "bpe_learn_deep", "unigram_seed_pieces", "unigram_train_pieces",
    "unigram_encode_stats", "stream_ivf_index",
    # WordPiece at 10× (local[32], 2026-08; sf0.1 first readings carry
    # codegen/worker warmup): learn 16.6s → 5.4s, encode 13.5s → 9.9s —
    # both FLAT-to-faster warm; the trainer task is vocab-bounded and
    # the warm cost is a multi-job latency floor (checkpoint
    # materialization + learn + alphabet + encode join), not data.
    "wordpiece_learn_vocab", "wordpiece_encode_stats",
]


def vocab_probe(sizes=(1_000_000, 2_500_000, 5_000_000),
                trainers=("bpe", "wp")) -> None:
    """Pin the single-task tokenizer-trainer MEMORY ceiling (round-11
    judge item): synthetic vocabularies of 1M / 2.5M / 5M distinct words
    (md5-hex words, 8-15 chars, Zipf-ish freqs) through
    ``learn_bpe_local`` and ``learn_wordpiece_local`` at 64 merges, with
    the env-gated ``record_task_peak`` hook reporting the Python
    worker's VmHWM from INSIDE the applyInPandas task.

    Usage::

        python tests/scale_probe.py --vocab [sizes...]

    Measured readings (local[32], 128 GiB box, 2026-08-16, 64 merges;
    worker reuse OFF so each VmHWM is that trainer's own peak):

        learn_bpe_local        1M:  85.4s  task peak 1.33 GiB
        learn_wordpiece_local  1M:  29.7s  task peak 1.65 GiB
        learn_bpe_local      2.5M:  >590s  task peak 3.08 GiB
        learn_wordpiece_local 2.5M:         task peak 3.76 GiB
        learn_wordpiece_local  5M:          task peak 7.32 GiB

    (The ≥2.5M wall times overran the probe's 10-minute budget — the
    hex-alphabet synthetic corpus is adversarial for affected-word
    scans: every word draws from the same ≤256 initial pair types, so
    each early merge rewrites ~half the vocab; a Zipfian natural vocab
    localizes merges far more.  Peak MEMORY, the contract being
    pinned, was still recorded from inside each completed task.)

    Both trainers scale LINEARLY in distinct words: ≈1.2 GiB per
    million for BPE, ≈1.5 GiB per million for WordPiece (the ##
    continuation symbols are not interned and the pair→sym index
    doubles the edges — WordPiece 1M/2.5M/5M fit 1.5 GiB/M within 3%).
    Ceiling with 2× headroom on a typical 32-64 GiB-task executor:
    ~10-25M distinct words for BPE, ~10-20M for WordPiece —
    comfortably past Heaps'-law vocabularies for a 100 TB monolingual
    corpus, but NOT for extreme multilingual (~100M words).  Beyond
    the ceiling: ``learn_bpe_batched`` (certified multi-merge rounds)
    for BPE, ``learn_wordpiece_rounds`` (exact argmax, one merge per
    driver round — the likelihood score's global unigram coupling
    makes a batching certificate degenerate, see its docstring) for
    WordPiece.  Both keep state in DataFrames, so memory scales with
    the cluster.
    """
    import duckdb
    from pyspark.sql import functions as F

    probe_file = "/tmp/trainer_probe.txt"
    # must be set BEFORE the JVM launches so local-mode Python workers
    # inherit it
    os.environ["SPARK_GRAFT_TRAINER_PROBE"] = probe_file

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from pyspark.sql import SparkSession

    from openskidata_processor_spark.operators.bpe import learn_bpe_local
    from openskidata_processor_spark.operators.wordpiece import (
        learn_wordpiece_local)

    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.driver.memory", "24g")
             # fresh Python worker per task: VmHWM is a process-lifetime
             # high-water mark, so a reused worker would report the MAX
             # across trainers instead of each trainer's own peak
             .config("spark.python.worker.reuse", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for n in sizes:
        path = f"/tmp/vocab_probe_{n}.parquet"
        if not os.path.exists(path):
            # 8-15 hex chars: collision-free at these sizes, so the
            # distinct-word count ≈ n by construction
            con.execute(f"""
              COPY (SELECT substr(md5(i::VARCHAR), 1, 8 + i % 8) AS w,
                           1 + i % 997 AS freq
                    FROM generate_series(1, {n}) t(i))
              TO '{path}' (FORMAT PARQUET)""")
        vocab = (spark.read.parquet(path)
                 .groupBy("w").agg(F.sum("freq").alias("freq")))
        pick = {"bpe": ("learn_bpe_local", learn_bpe_local),
                "wp": ("learn_wordpiece_local", learn_wordpiece_local)}
        for name, fn in (pick[t] for t in trainers):
            open(probe_file, "w").close()
            t0 = time.perf_counter()
            rows = fn(vocab, 64, min_count=2).collect()
            dt = time.perf_counter() - t0
            peaks = [line.split() for line in
                     open(probe_file).read().splitlines()]
            peak_gib = max((int(kb) / 1048576 for _, kb in peaks),
                           default=0.0)
            print(f"{name} n={n}: {len(rows)} merges, {dt:.1f}s, "
                  f"task peak {peak_gib:.2f} GiB", flush=True)


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


def bloom_probe(replicas: int = 80) -> None:
    """Bloom pre-join pruning vs the bloom-free exact join in the
    PRODUCTION decontamination shape: the benchmark is its own SMALL
    table (the 500-doc sf0.01 documents corpus — disjoint from sf0.1,
    ~1% 5-gram shingle overlap, so training is mostly NON-matching) and
    the training corpus is a ``replicas``× replica set.  The catalog
    query's in-corpus ``doc_id < 200`` slice exists only so its DuckDB
    oracle is self-contained on one table; at scale the eval suite is a
    separate table, and forcing it out of an unclustered 100 TB corpus
    would charge the bloom build a full-corpus scan it never pays in
    production.

    Regime A (broadcastable bench, AQE on — the toy scale): both plans
    broadcast the bench shingles; the bloom probe is expected OVERHEAD
    here, and the number to watch is that it stays small.  Regime B
    (autoBroadcastJoinThreshold=-1 — emulates a benchmark-shingle set
    past the broadcast threshold, the bloom niche: a 37M-key eval suite
    is gigabytes as strings but 32 MiB as a bitmap): the exact twin
    must shuffle EVERY training shingle; the bloom path shuffles only
    the ~1%-pass candidates.  Each timed run is fully self-contained
    (its own bench scan / sizing / build / persist), so the bloom build
    cost is charged to the bloom side.  Also asserts the two answers
    are identical (no false negatives + verify join).

    Cost model (measured 2026-08, local[32], phase-accounted
    min-of-2): the bloom side pays a ~1 s warm serial prefix (bench
    scan+count ~0.5 s + bitmap build ~0.4 s — driver job latency,
    corpus-independent) plus ~0.1 s per 1M training shingles for the
    one-xxhash64 probe, and saves the exact twin's training-shingle
    exchange+sort, LINEAR in the corpus.  Local NVMe shuffles these
    corpora at memory speed, so the wall-clock margin is thin and noisy
    below ~40× (40×: regime B 29.0 vs 27.3 s — inside host noise); at
    80× (default here) the bloom path edges ahead (regime B 61.3 vs
    61.7 s).  The structural claim — the verify join's shuffle INPUT is
    cut to ≲2% of the exact twin's with zero false negatives — is
    pinned deterministically in CI
    (tests/test_bloom.py::test_bloom_prunes_verify_shuffle_volume);
    on a network-shuffled cluster that volume ratio, not this host's
    NVMe wall-clock, is the operative number and the crossover moves
    far left."""
    import time as _time

    workdir = "/tmp/sfbig" if replicas == 10 else f"/tmp/sfbig{replicas}"
    if not os.path.exists(f"{workdir}/documents.parquet"):
        build(workdir, replicas=replicas)
    bench_table = "/root/testdata/sf0.01/documents.parquet"

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from openskidata_processor_spark.operators.bloom import (
        build_bloom_bits, might_contain, size_bits)
    from openskidata_processor_spark.plans.analytics import _t
    from openskidata_processor_spark.plans.hygiene import _bloom_shingles

    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.shuffle.partitions", "64")
             .config("spark.driver.memory", "16g")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    def bench_shingles():
        return (_bloom_shingles(spark.read.parquet(bench_table))
                .select("shingle").distinct().coalesce(8))

    def train_shingles():
        return _bloom_shingles(_t(spark, workdir, "documents"))

    def exact_twin(bench_sh):
        return (train_shingles()
                .join(bench_sh, "shingle", "left_semi")
                .groupBy("doc_id")
                .agg(F.count("*").alias("n_contaminated")))

    def bloom_query(bench_sh, bits):
        return (train_shingles()
                .filter(might_contain(F.col("shingle"), bits))
                .join(bench_sh, "shingle", "left_semi")
                .groupBy("doc_id")
                .agg(F.count("*").alias("n_contaminated")))

    def timed(fn):
        t0 = _time.perf_counter()
        r = fn()
        return r, _time.perf_counter() - t0

    # warm the scan cache once so neither side is charged first-read IO
    _t(spark, workdir, "documents").write.format(
        "noop").mode("overwrite").save()
    noop = lambda df: df.write.format(  # noqa: E731
        "noop").mode("overwrite").save()
    for regime, thresh in (("A broadcastable", "10485760"),
                           ("B non-broadcastable", "-1")):
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
        spark.conf.set(
            "spark.sql.adaptive.autoBroadcastJoinThreshold", thresh)
        # phase-accounted, interleaved, min-of-2 per phase: run-order /
        # GC noise at this corpus size is ±3 s, larger than the margin
        # a single run can resolve.  The bloom serial prefix (bench
        # scan+count, bitmap build) re-runs UNCACHED each repeat and is
        # charged to the bloom total; the verify query and the exact
        # twin share one cached bench frame per repeat so the ONLY
        # difference between the two timed queries is probe-vs-shuffle.
        phases = {k: [] for k in ("bench", "build", "bloom_q", "exact_q")}
        for _ in range(2):
            bench_sh, dt = timed(
                lambda: bench_shingles().persist())
            n, dt2 = timed(bench_sh.count)
            phases["bench"].append(dt + dt2)
            bits, dt = timed(lambda: build_bloom_bits(
                bench_sh, F.col("shingle"), n_bits=size_bits(n)))
            phases["build"].append(dt)
            _, dt = timed(lambda: noop(bloom_query(bench_sh, bits)))
            phases["bloom_q"].append(dt)
            _, dt = timed(lambda: noop(exact_twin(bench_sh)))
            phases["exact_q"].append(dt)
            bench_sh.unpersist()
        m = {k: min(v) for k, v in phases.items()}
        bloom_total = m["bench"] + m["build"] + m["bloom_q"]
        exact_total = m["bench"] + m["exact_q"]
        print(f"regime {regime}: bloom {bloom_total:.1f}s "
              f"(bench {m['bench']:.1f} + build {m['build']:.1f} + "
              f"query {m['bloom_q']:.1f}) vs exact {exact_total:.1f}s "
              f"(bench {m['bench']:.1f} + query {m['exact_q']:.1f})",
              flush=True)
    bench_sh = bench_shingles().persist()
    bits = build_bloom_bits(bench_sh, F.col("shingle"),
                            n_bits=size_bits(bench_sh.count()))
    bq, eq = bloom_query(bench_sh, bits), exact_twin(bench_sh)
    # SYMMETRIC multiset compare, and assert rather than print: a
    # one-sided exceptAll(bloom, exact) is blind to a whole doc MISSING
    # from the bloom side — the exact failure mode (a false negative)
    # this check exists to catch
    diff = bq.exceptAll(eq).count() + eq.exceptAll(bq).count()
    bench_sh.unpersist()
    assert diff == 0, f"bloom vs exact answers differ in {diff} rows"
    print("output identical: True", flush=True)


def main() -> None:
    if "--vocab" in sys.argv:
        tail_args = sys.argv[sys.argv.index("--vocab") + 1:]
        rest = [int(a) for a in tail_args if a.isdigit()]
        tr = [a for a in tail_args if a in ("bpe", "wp")]
        vocab_probe(tuple(rest) if rest else (1_000_000, 2_500_000,
                                              5_000_000),
                    tuple(tr) if tr else ("bpe", "wp"))
        return
    if "--skew" in sys.argv:
        skew_probe()
        return
    if "--hot-bucket" in sys.argv:
        hot_bucket_probe()
        return
    if "--bloom" in sys.argv:
        rest = sys.argv[sys.argv.index("--bloom") + 1:]
        bloom_probe(int(rest[0]) if rest else 80)
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

# round-11 additions, measured at 10x (local[32], 2026-08-16; sf0.1
# first readings carry the session's one-time codegen):
# kn_bigram_stats 7.8s -> 4.2s (bigram-TYPE-bounded after the one
# corpus scan — flat-to-faster warm).  kn_score_docs 2.1s -> 5.3s (the
# corpus-scale pair frame grows linearly; the three type-table joins
# and the 1-row broadcast stay flat).  ppl_bucket_docs 3.9s -> 6.8s
# (the bigram posting scan is the only growing stage; the percentile
# cutpoint agg collapses to one row).  wordpiece_learn_rounds
# 15.5s -> 14.2s at 8 merges — FLAT: the replica corpus has the same
# vocab, and the wall is 8 driver-round stage-latency floors, not
# data (the catalog entry registers 4 merges; learn_wordpiece_local
# remains the production path below the memory ceiling).
QUERIES_TO_PROBE += ["kn_bigram_stats", "kn_score_docs",
                     "ppl_bucket_docs", "wordpiece_learn_rounds"]

# kn3_score_docs at 10x (local[32], 2026-08-16): 14.2s -> 9.6s — the
# sf0.1 first reading carries the session's one-time codegen for the
# 6-join plan; the data-dependent work is the trigram posting scan
# (linear) against five type-bounded broadcast tables, so 10x data
# reads FASTER warm.
QUERIES_TO_PROBE += ["kn3_score_docs"]

# gopher_quality_docs at 10x (local[32], 2026-08-16): 5.4s -> 0.8s —
# the sf0.1 first reading is session codegen; warm, the single
# codegen pass + one source rollup is sub-second even at 10x data.
QUERIES_TO_PROBE += ["gopher_quality_docs"]

# c4_quality_docs at 10x (local[32], 2026-08-16): same shape as the
# Gopher audit — codegen warmup dominates the sf0.1 first reading,
# sub-second warm at 10x.
QUERIES_TO_PROBE += ["c4_quality_docs"]

# fineweb_quality_docs at 10x (local[32], 2026-08-16): codegen warmup
# dominates the sf0.1 first reading; warm at 10x the per-row
# sort+fold dup-line rule stays sub-second (no explode, no shuffle
# beyond the source rollup).
QUERIES_TO_PROBE += ["fineweb_quality_docs"]

# Round-12 additions, measured at 10x (local[32], 2026-08-17; sf0.1
# first readings carry the session's one-time codegen):
# mkn_score_docs 10.5s -> 11.3s — near-FLAT: the three-discount
# upgrade adds only per-type-table aggregate columns and a wider 1-row
# global; the data-dependent stage is the same trigram posting scan as
# kn3.  sbo_score_docs 3.5s -> 9.6s (2.7x wall for 10x data): the
# exploded 1/2/3-gram count shuffle is the linear stage; the five count
# tables stay Heaps-bounded and the scoring joins are type-table-sized.
# gopher_repetition_docs 3.9s -> 3.2s — FLAT warm: thirteen per-row
# sorted-array folds, no explode/join, one source rollup; the sf0.1
# first reading is dominated by codegen of the ~13-fold expression
# tree.
QUERIES_TO_PROBE += ["mkn_score_docs", "sbo_score_docs",
                     "gopher_repetition_docs"]

# source_unigram_kl at 10x (local[32], 2026-08-17): 7.0s -> 2.6s —
# the sf0.1 first reading is session codegen; warm, the one
# (source, word) count shuffle plus the word-level re-aggregation are
# both |sources|x-Heaps-bounded, and the JS out-of-support tail is
# CLOSED-FORM ((1-Q_S)*ln2), so no stage grows with sources x vocab.
QUERIES_TO_PROBE += ["source_unigram_kl"]
