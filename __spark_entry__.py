"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check at sf0.001.
``queries()``   — the catalog from openskidata_processor_spark.plans
                  (one entry per SURVEY.md §2 operator class + the
                  training-data-pipeline operators).
``oracle_sql()``— matching DuckDB SQL for every exactly-reproducible query;
                  approximate operators (MinHash-LSH / SimHash / LSH-ANN /
                  IVF-ANN / PQ-ANN / sketches) are intentionally
                  oracle-free (rows-only checks, recall-harness-pinned).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from openskidata_processor_spark.plans import ORACLES, QUERIES  # noqa: E402

# The correctness driver snapshots the FIRST 50 entries of ``queries()``
# in iteration order.  This curated window puts exactly 50 oracle-backed
# representatives (one-plus per operator family) inside it; the remaining
# oracle-backed queries are gated by the IDENTICAL DuckDB check in
# tests/test_oracle_parity.py, and the 8 approximate-by-design queries
# (recall-harness-pinned in pytest, timed in bench.py) come last.  The
# full map is documented in COVERAGE.md §"Driver correctness window".
# Out-of-window queries are NOT soft-gated: test_oracle_parity runs in the
# mandatory `make test` suite, so a regression there is a hard pytest
# failure even though it won't appear in CORRECTNESS_r{N}.json — if the
# driver window ever widens past 50, drop this curation and register in
# natural order.
_DRIVER_WINDOW = [
    # relational / pipeline core (o4_union_orders rotated out for the
    # formatter-path probe: its class is also pinned by the K5 sink tests
    # and the identical parity check; p5_lifecycle_resolution puts the
    # status/flag formatter semantics — the round-5 blind spot — under the
    # driver's hard signal)
    "a2_pricing_summary", "j8_regional_revenue", "w1_top_order_per_customer",
    "o5_customers_without_orders", "a1_merged_order_status",
    "p5_lifecycle_resolution",
    "a7_lineitem_dedup", "w_running_total",
    "a6_daily_event_stats", "sessionize_user_sessions",
    # specialised joins (j3_acctbal_distance_join rotated out in round 11
    # for the never-windowed probes below — the J3 distance-join class
    # keeps j3_geo_dwithin in-window and stays parity-gated)
    "asof_latest_order", "range_band_counts",
    # geometry / graph
    "j2_points_in_polygon", "j3_geo_dwithin", "cc_components",
    # raster / projection kernel (§2.8) — r3_terrain_decode rotated out
    # in round 10 for the never-windowed probes below; the raster family
    # keeps two in-window entries and r3 stays parity-gated
    "r1_mercator_tiles", "r2_viirs_pixel_rollup",
    # text analysis + dedup families (exact members;
    # dedup_ngram_jaccard rotated out in round 11 — the dedup family
    # keeps three in-window entries and it stays parity-gated)
    "text_doc_stats", "quality_docs", "dedup_exact",
    "dedup_group_resolution", "knn_cosine", "dedup_embedding_pairs",
    # training-data operators (vocab_top_terms / sample_mixture_epochs
    # rotated out in round 8 for the web-ingestion probes below — their
    # families stay in-window via tfidf_doc_terms and the other two
    # samplers, and they stay hard-gated by the identical parity check)
    # (sample_temperature_mixture rotated out in round 9 for the
    # tokenizer-family probes below — sample_stratified keeps the
    # sampler family in-window; it stays hard-gated by the identical
    # parity check)
    "cdc_merge_upsert", "quantiles_exact", "tfidf_doc_terms",
    "rollup_multi_granularity", "sample_stratified",
    # tokenizer family (round 11 rotates the never-windowed round-10
    # probes in — unigram seed pieces and the Kneser–Ney bigram count
    # tables — and pmi_collocations back out after its green round-10
    # window run; the r8 lesson: rotation is where latent defects
    # surface, so never-windowed oracle entries take priority over
    # already-proven ones)
    "bpe_pair_stats", "split_holdout_stats",
    "unigram_seed_pieces", "kn_bigram_stats",
    # hygiene / packing (pack_concat_bins rotated out likewise —
    # pack_sequences keeps the packing family in-window;
    # quality_repetition rotated out in round 10 for the probes here —
    # quality_docs keeps the quality family in-window — making room for
    # the never-windowed CCNet line-level dedup and the k-anonymity
    # privacy audit)
    "pii_redact_docs", "contamination_ngram",
    "dedup_passages", "pack_sequences",
    "shard_assignment", "line_dedup_docs", "k_anonymity_stats",
    # round-11 re-window: l_diversity_stats rejoins its k-anonymity
    # sibling after the r10 driver host-noise reading on untouched code
    # (a fresh in-window row settles it)
    "l_diversity_stats",
    # round-8 web-ingestion + bloom probes, and the round-9 language-ID
    # stage completing the crawl family (url_canonical_stats rotated out
    # in round 11 — html_extract_text keeps the crawl family in-window;
    # it stays parity-gated)
    "html_extract_text", "bloom_decontaminate",
    "lang_id_confusion",
    # multimodal (multimodal_resize_stats rotated out for lang_id in
    # round 9, multimodal_frame_sample for the tokenizer probes,
    # multimodal_audio_stats in round 10 — the family keeps two
    # in-window entries; all rotated-out queries stay hard-gated by the
    # identical parity check + the pytest suite)
    "multimodal_decode_stats", "multimodal_video_stats",
    # streaming (round 11 rotates the never-windowed streaming
    # vocab-ledger twin in — it shares bpe_pair_stats' oracle, so a
    # ledger replay defect would surface as a driver hash mismatch)
    "stream_event_counts", "stream_stateful_sessions", "stream_dedup_exact",
    "stream_lake_ingest", "stream_bpe_pair_stats",
]


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["a2_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    ordered = dict.fromkeys(_DRIVER_WINDOW)
    assert len(ordered) == 50, "driver window must hold exactly 50 queries"
    for name in ordered:
        assert name in QUERIES and name in ORACLES, name
    for name in QUERIES:            # oracle-backed overflow, then approximates
        if name not in ordered and name in ORACLES:
            ordered[name] = None
    for name in QUERIES:
        if name not in ordered:
            ordered[name] = None
    return {name: QUERIES[name] for name in ordered}


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
