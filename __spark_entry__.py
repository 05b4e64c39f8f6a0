"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001;
``queries()`` / ``oracle_sql()`` expose every implemented operator
from SURVEY.md §2 with its DuckDB oracle twin. Implementation lives in
``flink_precisely_demo_spark/``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from flink_precisely_demo_spark.plans import queries as _q
# importing registers additional queries into _q.QUERIES / _q.ORACLES
from flink_precisely_demo_spark.plans import (  # noqa: F401
    ann_queries,
    cdc_queries,
    crawl_queries,
    curation_queries,
    ddl_queries,
    dedup_queries,
    graph_queries,
    layout_queries,
    misc_queries,
    multimodal_queries,
    olap_queries,
    reference_sql,
    search_queries,
    similarity_queries,
    sketch_queries,
    text_queries,
    window_queries,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (reference sql/output.sql re-expressed) on sf0.001."""
    from flink_precisely_demo_spark.plans.flagship import flagship_query
    return flagship_query(spark, "/root/testdata/sf0.001")


# The driver snapshots the FIRST 50 registered queries for its
# oracle-differential correctness run. `_DEFERRED` rotates entries to
# the tail (outside the snapshot) so the window prioritizes code that
# still NEEDS external validation. The deferral criterion is
# mechanical, enforced by tests/test_oracle_parity.py::
# test_deferred_entries_have_driver_green_history: an entry may sit
# in _DEFERRED only with (a) >= 2 driver-green rounds in the
# CORRECTNESS_r*.json artifacts, or (b) exactly 1 driver-green round
# PLUS a passing row at every scale point of the latest SWEEP_r*.json
# (sf1 + sf10 full-hash/digest checks) — the r10 amendment
# implementing the r9 verdict's rotation directive. The §2.1 parity
# surfaces stay in the window unconditionally (guarded by
# test_parity_queries_inside_driver_window), stalest evidence rotates
# back in first, and ALL pairs still run in tests/test_oracle_parity.py
# regardless of position. Per-round rotation history lives in
# COVERAGE.md ("Window rotation log").
#
# r11 window (50 seats): the 12-entry parity/TPC-H floor; the ENTIRE
# r7-last-green cohort (17 entries, 4 rounds stale — the r10
# verdict's mandated refresh, sliding_window_events first as the
# entry the triangle re-seat displaced: top_k_per_group,
# similarity_bruteforce_topk/ivf_cells, date_functions,
# dedup_embedding_cosine/ngram_jaccard, embedding_quantize_stats,
# multimodal_audio_decode, cdc_history_scd2, streaming_dedup_replay,
# curation_contamination, text_chunk_windows/html_extract/pii_scrub/
# tfidf_top_terms, url_canonicalize); seats HELD for the two r10
# surfaces whose semantics are new and need a second green
# (streaming_enrichment_replay, the re-seated web_triangle_count);
# attribution_multi_touch seated so the r10 hot-key caps' oracle
# mirror gets driver exposure (its only validation so far is the r10
# sweep — r10 verdict item 6); the NEW streaming_scd2_replay (never
# validated); and 17 keepers from the r10 window (the 3-green
# q4/q21/q22/video block plus function-coverage entries). Seats paid
# by 19 r10-greened entries, each with >= 4 driver greens.
_DEFERRED = [
    "ann_index_topk",                # r2 r3 r4 r5 r8
    "ann_ivf_pq_topk",               # r9 + sf1/sf10 sweep
    "ann_recall_eval",               # r9 + sf1/sf10 sweep
    "anti_semi_join",                # r2 r6 r10
    "approx_sketches",               # r3 r4 r5 r8
    "asof_join_prior_click",         # r1 r2 r3 r4 r5 r8
    "audio_stream_triage",           # r7 r8
    "bloom_semijoin_prune",          # r9 + sf1/sf10 sweep
    "bpe_encode_corpus",             # r9 + sf1/sf10 sweep
    "bpe_vocab_merges",              # r9 + sf1/sf10 sweep
    "cdc_apply_snapshot",            # r5 r6 r10
    "cdc_state_asof",                # r2 r3 r4 r5 r8
    "corpus_datasheet",              # r9 + sf1/sf10 sweep
    "corpus_health_report",          # r7 r8
    "corpus_snapshot_diff",          # r7 r8
    "crawl_to_training_shards",      # r9 + sf1/sf10 sweep
    "curation_mixture_sample",       # r7 r8
    "curation_pack_chunks",          # r5 r6 r10
    "curation_pipeline_e2e",         # r6 r7 r10
    "curation_stratified",           # r3 r4 r5 r8
    "ddl_entry_pipeline",            # r2 r3 r4 r5 r8
    "dedup_clusters",                # r3 r4 r5 r8
    "dedup_exact",                   # r1 r2 r3 r4 r5 r8
    "dedup_minhash_lsh",             # r6 r7 r10
    "dedup_passage_exact",           # r9 + sf1/sf10 sweep
    "dedup_pipeline_e2e",            # r5 r6 r10
    "dedup_semantic",                # r7 r8
    "dedup_simhash",                 # r3 r7 r10
    "dedup_simhash_pairs",           # r3 r7 r10
    "deletion_propagation_audit",    # r9 + sf1/sf10 sweep
    "distinct_agg",                  # r2 r6 r10
    "embedding_hard_negatives",      # r9 + sf1/sf10 sweep
    "embedding_pq_codebook",         # r9 + sf1/sf10 sweep
    "event_funnel_steps",            # r8 r9
    "event_pattern_match",           # r9 + sf1/sf10 sweep
    "full_outer_join_nulls",         # r2 r6 r10
    "intersect_keys",                # r2 r6 r10
    "jsonl_corpus_roundtrip",        # r9 + sf1/sf10 sweep
    "kmeans_ivf_index",              # r2 r3 r4 r5 r8
    "multimodal_format_audit",       # r7 r8 r9
    "multimodal_manifest",           # r2 r3 r4 r5 r8
    "pivot_events",                  # r2 r6 r10
    "q10_returned_items",            # r4 r5 r8
    "q11_important_stock",           # r9 + sf1/sf10 sweep
    "q12_shipping_priority_class",   # r9 + sf1/sf10 sweep
    "q13_customer_distribution",     # r4 r5 r8
    "q14_promo_revenue",             # r4 r5 r8
    "q15_top_supplier",              # r4 r5 r9
    "q16_supplier_part_types",       # r9 + sf1/sf10 sweep
    "q17_small_quantity_revenue",    # r4 r5 r9
    "q19_disjunctive_revenue",       # r4 r5 r8
    "q1_pricing_summary",            # r6 r7 r10
    "q20_potential_promotion",       # r9 + sf1/sf10 sweep
    "q2_min_cost_supplier",          # r9 + sf1/sf10 sweep
    "q3_shipping_priority",          # r1 r3 r4 r5 r8
    "q6_forecast_revenue",           # r4 r5 r8
    "q7_volume_shipping",            # r4 r5 r8
    "q8_market_share",               # r4 r5 r8
    "q9_product_type_profit",        # r9 + sf1/sf10 sweep
    "range_join_events",             # r1 r2 r3 r4 r5 r8
    "robots_txt_gate",               # r8 r9
    "rollup_agg",                    # r2 r6 r10
    "session_window_events",         # r4 r7 r10
    "sessionization",                # r2 r3 r4 r5 r8
    "set_ops",                       # r2 r6 r10
    "similarity_ivf_topk",           # r6 r7 r10
    "sketch_heavy_hitters",          # r9 + sf1/sf10 sweep
    "skew_salted_agg",               # r8 r9
    "streaming_attribution_replay",  # r9 + sf1/sf10 sweep
    "streaming_funnel_replay",       # r8 r9
    "streaming_pattern_replay",      # r9 + sf1/sf10 sweep
    "streaming_session_replay",      # r9 + sf1/sf10 sweep
    "string_math_funcs",             # r2 r6 r10
    "table_profile_orders",          # r8 r9
    "text_bigram_typicality",        # r9 + sf1/sf10 sweep
    "text_bm25_term_scores",         # r8 r9
    "text_filter_pipeline",          # r1 r3 r4 r5 r8
    "text_repetition_quality",       # r6 r7 r10
    "text_token_stats",              # r1 r3 r4 r5 r8
    "text_winnow_fingerprints",      # r9 + sf1/sf10 sweep
    "warc_ingest_extract",           # r7 r8
    "warc_to_corpus",                # r8 r9
    "web_link_pagerank",             # r7 r8
    "zorder_layout_stats",           # r8 r9
]


# Queries added MID-ROUND after the 50-seat window was finalized
# (sweeps/bench already recorded against it) park here until the next
# rotation hands them seats. Distinct from _DEFERRED: a _PENDING entry
# has NEVER appeared in any CORRECTNESS_r*.json (guarded by
# tests/test_oracle_parity.py::test_pending_entries_are_never_validated
# — the list cannot be used to hide once-red or once-green entries).
# All pairs still run in the local pytest oracle sweep regardless.
#
# r11: streaming_scd2_replay was registered BEFORE this round's
# rotation was finalized, so it takes a window seat directly; no
# mid-round additions yet.
_PENDING: list[str] = [
]


def _ordered(mapping: dict) -> dict:
    parked = set(_DEFERRED) | set(_PENDING)
    head = {k: v for k, v in mapping.items() if k not in parked}
    tail = {k: mapping[k] for k in _DEFERRED if k in mapping}
    pend = {k: mapping[k] for k in _PENDING if k in mapping}
    return {**head, **tail, **pend}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _ordered(dict(_q.QUERIES))


def oracle_sql() -> dict[str, str]:
    return _ordered(dict(_q.ORACLES))
