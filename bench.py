#!/usr/bin/env python3
"""Benchmark harness: runs the headline catalog queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

    {"metric": "total_query_seconds", "value": N, "unit": "sec",
     "queries": {...}, "sf": "..."}

Each query executes fully (noop sink — no driver collect of large results);
a warmup run of the flagship query pays JVM/codegen startup once so per-query
numbers reflect steady-state execution.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from openskidata_processor_spark.plans import QUERIES  # noqa: E402
from openskidata_processor_spark.session import get_spark  # noqa: E402

# The original 16-query set — DO NOT change: BENCH_r{N}.json artifacts are
# compared per-query across rounds, and edits break that longitudinal
# comparison.  New operator families get numbers via EXTENDED_QUERIES.
BENCH_QUERIES = [
    "a2_pricing_summary",
    "j8_regional_revenue",
    "w1_top_order_per_customer",
    "a1_merged_order_status",
    "j3_acctbal_distance_join",
    "w_running_total",
    "a6_daily_event_stats",
    "sessionize_user_sessions",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "knn_cosine",
    "ann_lsh_topk",
    "dedup_embedding_lsh",
    "j2_points_in_polygon",
    "j3_geo_dwithin",
]

# Additive second set (timed identically, reported under "extended";
# excluded from the headline "value" so it stays comparable to r1-r3).
EXTENDED_QUERIES = [
    "asof_latest_order",
    "range_band_counts",
    "dedup_group_resolution",
    "cc_components",
    "multimodal_decode_stats",
    "cdc_merge_upsert",
    "sample_stratified",
    "quantiles_exact",
    "tfidf_doc_terms",
    "sketch_doc_stats",
    "pii_redact_docs",
    "quality_repetition",
    "contamination_ngram",
    "dedup_passages",
    "pack_sequences",
    "shard_assignment",
    "ann_pq_topk",
    "multimodal_audio_stats",
    "stream_enriched_rollup",
    "rollup_multi_granularity",
    "r4_viirs_rasterize_points",
    "stream_click_attribution",
    "multimodal_video_stats",
    "sample_temperature_mixture",
    "sample_mixture_epochs",
    "stream_lake_ingest",
    "vocab_top_terms",
    "heavy_hitters_sketch",
    "pack_concat_bins",
    "multimodal_resize_stats",
    "kmeans_clusters",
    "bm25_topk_docs",
    "stream_dedup_bounded",
    "semdedup_keep",
    "lm_perplexity_docs",
    "logreg_quality_scores",
    "dup_ngram_docs",
    "dsir_select_docs",
    "centroid_outlier_docs",
    "curate_corpus",
    "multimodal_phash_groups",
    "multimodal_audio_fingerprint",
    "multimodal_video_fingerprint",
    "stream_curate_stats",
    "sample_cap_per_source",
    "multimodal_near_dup_groups",
    "substring_dedup_spans",
    "semantic_decontamination",
    "winnow_fingerprint_pairs",
    "length_bucket_batches",
    "scd2_user_history",
    "zorder_file_stats",
    "profile_table_stats",
    "stream_winnow_pairs",
    "curriculum_stages",
    "snapshot_diff",
    "html_extract_text",
    "url_canonical_stats",
    "mojibake_stats",
    "profile_table_sketch",
    "chunk_documents",
    "bloom_decontaminate",
    "blocklist_filter_docs",
    "script_stats",
    "file_skipping_stats",
    "compaction_plan",
    "quantiles_sketch",
    "stream_minhash_pairs",
    "oov_rate_docs",
    "source_overlap_matrix",
    # round-9 additions: trained-model language identification and
    # CCNet line-level boilerplate removal
    "lang_id_confusion",
    "line_dedup_docs",
    "stream_ivf_index",
    # round-9 tokenizer family: BPE pair stats / iterative merge
    # learning, PMI collocations, leakage-safe holdout split
    "bpe_pair_stats",
    "bpe_learn_merges",
    # round-10: zero-driver-round deep learning (64 merges, one
    # applyInPandas task) — the production path for real merge depths
    "bpe_learn_deep",
    "bpe_encode_stats",
    "pmi_collocations",
    "split_holdout_stats",
    # composed end-to-end: hygiene -> dedup -> split -> train-only BPE
    "training_corpus_stats",
    # round-10 unigram-LM (SentencePiece-style) tokenizer family
    "unigram_seed_pieces",
    "unigram_train_pieces",
    "unigram_encode_stats",
    # round-10 WordPiece (BERT) family + the round-11 distributed
    # rounds fallback (one exact argmax per driver round)
    "wordpiece_learn_vocab",
    "wordpiece_encode_stats",
    "wordpiece_learn_rounds",
    # round-10 Kneser-Ney bigram smoothing statistics (oracle-backed)
    # + the round-11 interpolated-KN document scorer over the same
    # tables (oracle-backed)
    "kn_bigram_stats",
    "kn_score_docs",
    "kn3_score_docs",
    # round-12: modified Kneser-Ney (three count-dependent discounts
    # per level, Chen & Goodman 1998 eq. 26) and Stupid Backoff
    # holdout scoring (Brants et al. 2007)
    "mkn_score_docs",
    "sbo_score_docs",
    # round-12: the repetition half of Gopher's filter table, and the
    # per-source KL/JS divergence for data-mixing decisions
    "gopher_repetition_docs",
    "source_unigram_kl",
    "stream_gopher_quality",
    # round-11 CCNet head/middle/tail perplexity-tercile split +
    # the Gopher Table-A1 rule filter
    "ppl_bucket_docs",
    "gopher_quality_docs",
    "c4_quality_docs",
    "fineweb_quality_docs",
    # streaming vocab-ledger twin of bpe_pair_stats
    "stream_bpe_pair_stats",
    # privacy-governance audits: k-anonymity lattice + l-diversity
    "k_anonymity_stats",
    "l_diversity_stats",
]


# End-to-end pipeline benchmark (the reference's primary workload is the
# whole prepare() graph, not single operators — PerformanceMonitor.ts
# phase timeline).  Two sizes of the synthetic resort grid; skippable via
# SPARK_GRAFT_SKIP_E2E=1.  Measured 2026-08 (local[32]): ~95-125 s each
# depending on machine load — wall time is fixed overhead (stage
# scheduling + CC rounds), so the 10× number moving away from the 1×
# number is the regression signal for superlinear per-resort cost.
E2E_SIZES = (50, 500)


def run_e2e_prepare(spark, n_resorts: int) -> float:
    # Measured cost split (local[32], 50 resorts): ~40% is ONE-TIME
    # Catalyst optimization + janino codegen of the wide formatter
    # projections (first materialization of format_runs: 7.7 s vs 1.5 s
    # steady-state) — a per-session cost a real deployment amortizes over
    # hours.  Deliberately NOT warmed up away: the e2e entries stay
    # cold-start for longitudinal comparability, and the 500/50 ratio
    # nets the fixed cost out (ratio < 2 = flat per-resort marginal).
    from openskidata_processor_spark.pipeline.prepare import prepare
    from openskidata_processor_spark.sources.synthetic import resort_grid

    t0 = time.perf_counter()
    layers = prepare(spark, **resort_grid(spark, n_resorts))
    for df in layers.values():
        df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def run_query(spark, name: str, sf_dir: str) -> float:
    t0 = time.perf_counter()
    df = QUERIES[name](spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("openskidata-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warmup: pay JVM + codegen startup once, and spin up the Arrow/pandas
    # Python worker pool (otherwise the first pandas-UDF query is charged
    # ~32 × worker-fork latency that no steady-state run pays).
    try:
        run_query(spark, "a2_pricing_summary", sf_dir)
        from pyspark.sql import functions as F

        # the warmup UDF must IMPORT the numeric stack: a bare identity
        # UDF forks the workers but leaves numpy/pandas unimported, so the
        # first real pandas-UDF query was charged ~32 × numpy-import (~8s
        # observed on the minhash signature stage)
        def _warm_fn(x):
            import numpy as np
            import pandas as pd  # noqa: F401
            return type(x)(np.asarray(x, dtype="float64") * 2.0)

        _warm = F.pandas_udf(_warm_fn, "double")
        par = spark.sparkContext.defaultParallelism
        (spark.range(par * 4).repartition(par)
         .select(_warm(F.col("id").cast("double")))
         .write.format("noop").mode("overwrite").save())
    except Exception as exc:  # warmup failure must not kill the bench
        print(f"warmup failed: {type(exc).__name__}: {exc}", file=sys.stderr)

    # Per-query fault isolation: one broken query must never destroy the
    # whole bench artifact — failures record as "ERR:<type>" and the JSON
    # line always prints.
    timings: dict[str, float | str] = {}
    for name in BENCH_QUERIES:
        try:
            timings[name] = round(run_query(spark, name, sf_dir), 3)
        except Exception as exc:
            timings[name] = f"ERR:{type(exc).__name__}"
            print(f"{name} failed: {exc}", file=sys.stderr)

    extended: dict[str, float | str | list[float]] = {}
    for name in EXTENDED_QUERIES:
        try:
            extended[name] = round(run_query(spark, name, sf_dir), 3)
        except Exception as exc:
            extended[name] = f"ERR:{type(exc).__name__}"
            print(f"{name} failed: {exc}", file=sys.stderr)

    if os.environ.get("SPARK_GRAFT_SKIP_E2E") != "1":
        # Median-of-N (default 3): the single-shot e2e reading was
        # bimodal — ~110 s clean vs ~170 s when taken right after a
        # heavy suite's JVM exits — which masked real drift across
        # rounds.  The first run still pays the one-time Catalyst/janino
        # codegen (recorded in <key>_runs for the cold-start signal);
        # the MEDIAN is the recorded headline, so a single
        # host-pressure outlier can no longer move the artifact.
        repeats = max(1, int(os.environ.get("SPARK_GRAFT_E2E_REPEATS",
                                            "3")))
        for n in E2E_SIZES:
            key = f"e2e_prepare_{n}"
            try:
                runs = [round(run_e2e_prepare(spark, n), 3)
                        for _ in range(repeats)]
                # true median (even repeat counts average the middle
                # two; sorted(runs)[len//2] was the upper-middle, biasing
                # even-N artifacts upward)
                extended[key] = round(statistics.median(runs), 3)
                if repeats > 1:
                    extended[f"{key}_runs"] = runs
            except Exception as exc:
                extended[key] = f"ERR:{type(exc).__name__}"
                print(f"{key} failed: {exc}", file=sys.stderr)

    total = round(sum(v for v in timings.values()
                      if isinstance(v, (int, float))), 3)
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    print(json.dumps({
        "metric": "total_query_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "extended": extended,
        "sf": sf,
    }))
    # Tail-safety: the full line above now exceeds bounded log tails
    # (BENCH_r07.json recorded "parsed": null because the 106-entry line
    # outgrew the tail window).  A final COMPACT line guarantees any
    # tail-truncated capture still ends with parseable JSON carrying the
    # headline number.
    #
    # Round 13 (VERDICT r12 item 4): the driver's capture window is the
    # LAST 2000 characters of stdout, and its per-query/scaling tables come
    # from the last parseable line's "queries" dict — which for two rounds
    # was absent because only the compact totals survived the tail.  The
    # compact line therefore now ALSO carries (a) the full 16-entry
    # headline "queries" dict (~650 chars — always fits) and (b) as many
    # of the SLOWEST extended entries as keep the whole line under the
    # budget below (slowest-first: the sub-second entries are fixed-
    # latency noise; the expensive ones are what perf comparison needs).
    # This is a measurement-visibility fix only: the big line above is
    # unchanged, no timing methodology changed, values are identical.
    tail_budget = 1900          # < the driver's 2000-char window
    compact: dict[str, object] = {
        "metric": "total_query_seconds",
        "value": total,
        "unit": "sec",
        "sf": sf,
        "n_queries": len(timings),
        "n_extended": len(extended),
        "queries": timings,
    }
    numeric_ext = sorted(
        ((k, v) for k, v in extended.items()
         if isinstance(v, (int, float))),
        key=lambda kv: -kv[1])
    ext_out: dict[str, float] = {}
    line = json.dumps(compact)
    for k, v in numeric_ext:
        candidate = dict(compact)
        candidate["extended"] = {**ext_out, k: v}
        candidate["extended_omitted"] = len(numeric_ext) - len(ext_out) - 1
        cand_line = json.dumps(candidate)
        if len(cand_line) > tail_budget:
            break
        ext_out[k] = v
        line = cand_line
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
