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
# r13 window (50 seats), per the r12 verdict's mandate: the 12-entry
# parity/TPC-H floor; the FIVE r12 _PENDING pairs taking their first
# driver seats (csv_ingest_policy, ann_index_upsert_topk,
# streaming_ann_upsert_replay, ann_index_health,
# bucketed_colocated_join — the ANN LSM maintenance family + the
# delimited source + the bucketed layout); the ENTIRE 28-entry
# r9-last-green cohort (4 rounds stale: ann_ivf_pq_topk,
# ann_recall_eval, bloom_semijoin_prune, both BPE pairs,
# corpus_datasheet, crawl_to_training_shards, dedup_passage_exact,
# deletion_propagation_audit, embedding_hard_negatives,
# embedding_pq_codebook, event_pattern_match, jsonl_corpus_roundtrip,
# multimodal_format_audit, q2/q9/q11/q12/q15/q16/q17/q20,
# sketch_heavy_hitters, streaming_attribution_replay,
# streaming_pattern_replay, streaming_session_replay,
# text_bigram_typicality, text_winnow_fingerprints); this round's
# THREE new pairs (ann_recall_maintained, streaming_flagship_replay,
# skew_salted_join — verdict items 4/5/6, never driver-validated);
# and 2 stalest-first fill seats from the r10 cohort (anti_semi_join,
# distinct_agg — fewest greens, alphabetical tiebreak). Seats paid by
# the r8+r12- and r11-green cohorts, every one eligible under the
# mechanical rule (zero single-green deferrals this round).
# Annotations are machine-generated from CORRECTNESS_r*.json via
# scripts/green_history.py and list EVERY green round.
_DEFERRED = [
    "ann_index_topk",                     # r2 r3 r4 r5 r8 r12
    "approx_sketches",                    # r3 r4 r5 r8 r12
    "array_functions_embeddings",         # r1 r2 r6 r10 r11
    "asof_join_prior_click",              # r1 r2 r3 r4 r5 r8 r12
    "attribution_multi_touch",            # r9 r11
    "audio_stream_triage",                # r7 r8 r12
    "cdc_apply_snapshot",                 # r1 r2 r3 r4 r5 r6 r10
    "cdc_history_scd2",                   # r6 r7 r11
    "cdc_state_asof",                     # r2 r3 r4 r5 r8 r12
    "corpus_health_report",               # r7 r8 r12
    "corpus_snapshot_diff",               # r7 r8 r12
    "cube_agg",                           # r1 r2 r6 r10 r11
    "curation_contamination",             # r2 r3 r4 r7 r11
    "curation_mixture_sample",            # r7 r8 r12
    "curation_pack_chunks",               # r2 r3 r4 r5 r6 r10
    "curation_pipeline_e2e",              # r2 r3 r4 r5 r6 r7 r10
    "curation_sample",                    # r2 r3 r7 r10 r11
    "curation_split",                     # r2 r3 r7 r10 r11
    "curation_stratified",                # r3 r4 r5 r8 r12
    "date_functions",                     # r1 r3 r4 r7 r11
    "ddl_entry_pipeline",                 # r2 r3 r4 r5 r8 r12
    "dedup_clusters",                     # r3 r4 r5 r8 r12
    "dedup_embedding_cosine",             # r1 r3 r4 r7 r11
    "dedup_exact",                        # r1 r2 r3 r4 r5 r8 r12
    "dedup_minhash_lsh",                  # r1 r2 r3 r4 r5 r6 r7 r10
    "dedup_ngram_jaccard",                # r1 r2 r3 r7 r11
    "dedup_pipeline_e2e",                 # r3 r4 r5 r6 r10
    "dedup_semantic",                     # r7 r8 r12
    "dedup_simhash",                      # r1 r2 r3 r7 r10
    "dedup_simhash_pairs",                # r1 r2 r3 r7 r10
    "embedding_quantize_stats",           # r2 r3 r4 r7 r11
    "event_funnel_steps",                 # r8 r9 r12
    "full_outer_join_nulls",              # r1 r2 r6 r10
    "grouping_sets",                      # r1 r2 r6 r10 r11
    "histogram_buckets",                  # r1 r2 r6 r10 r11
    "intersect_keys",                     # r1 r2 r6 r10
    "kmeans_ivf_index",                   # r2 r3 r4 r5 r8 r12
    "multimodal_audio_decode",            # r5 r6 r7 r11
    "multimodal_image_decode",            # r5 r6 r7 r10 r11
    "multimodal_manifest",                # r2 r3 r4 r5 r8 r12
    "multimodal_video_decode",            # r5 r6 r10 r11
    "percentile_exact",                   # r1 r2 r6 r10 r11
    "pivot_events",                       # r1 r2 r6 r10
    "q10_returned_items",                 # r4 r5 r8 r12
    "q13_customer_distribution",          # r4 r5 r8 r12
    "q14_promo_revenue",                  # r4 r5 r8 r12
    "q19_disjunctive_revenue",            # r4 r5 r8 r12
    "q1_pricing_summary",                 # r1 r2 r3 r4 r5 r6 r7 r10
    "q21_waiting_supplier",               # r5 r6 r10 r11
    "q22_global_sales_opportunity",       # r5 r6 r10 r11
    "q3_shipping_priority",               # r1 r3 r4 r5 r8 r12
    "q4_order_priority",                  # r5 r6 r10 r11
    "q6_forecast_revenue",                # r4 r5 r8 r12
    "q7_volume_shipping",                 # r4 r5 r8 r12
    "q8_market_share",                    # r4 r5 r8 r12
    "range_join_events",                  # r1 r2 r3 r4 r5 r8 r12
    "regex_extract_props",                # r1 r2 r6 r10 r11
    "robots_txt_gate",                    # r8 r9 r12
    "rollup_agg",                         # r1 r2 r6 r10
    "session_window_events",              # r1 r3 r4 r7 r10
    "sessionization",                     # r2 r3 r4 r5 r8 r12
    "set_ops",                            # r1 r2 r6 r10
    "similarity_bruteforce_topk",         # r1 r2 r3 r7 r11
    "similarity_ivf_cells",               # r1 r2 r3 r7 r11
    "similarity_ivf_topk",                # r1 r2 r3 r4 r5 r6 r7 r10
    "skew_salted_agg",                    # r8 r9 r12
    "sliding_window_events",              # r1 r3 r4 r7 r11
    "streaming_dedup_replay",             # r6 r7 r11
    "streaming_enrichment_replay",        # r10 r11
    "streaming_funnel_replay",            # r8 r9 r12
    "streaming_scd2_replay",              # r11 r12
    "string_math_funcs",                  # r1 r2 r6 r10
    "subquery_in_exists",                 # r1 r2 r6 r10 r11
    "table_profile_orders",               # r8 r9 r12
    "text_bm25_term_scores",              # r8 r9 r12
    "text_chunk_windows",                 # r6 r7 r11
    "text_filter_pipeline",               # r1 r3 r4 r5 r8 r12
    "text_html_extract",                  # r6 r7 r11
    "text_language_id",                   # r1 r3 r7 r10 r11
    "text_pii_scrub",                     # r6 r7 r11
    "text_quality_score",                 # r1 r3 r7 r10 r11
    "text_repetition_quality",            # r3 r4 r5 r6 r7 r10
    "text_tfidf_top_terms",               # r6 r7 r11
    "text_token_stats",                   # r1 r3 r4 r5 r8 r12
    "top_k_per_group",                    # r1 r2 r3 r7 r11
    "unpivot_measures",                   # r1 r2 r6 r10 r11
    "url_canonicalize",                   # r6 r7 r11
    "warc_ingest_extract",                # r7 r8 r12
    "warc_to_corpus",                     # r8 r9 r12
    "web_link_pagerank",                  # r7 r8 r12
    "web_triangle_count",                 # r9 r10 r11
    "zorder_layout_stats",                # r8 r9 r12
]


# Queries added MID-ROUND after the 50-seat window was finalized
# (sweeps/bench already recorded against it) park here until the next
# rotation hands them seats. Distinct from _DEFERRED: a _PENDING entry
# has NEVER appeared in any CORRECTNESS_r*.json (guarded by
# tests/test_oracle_parity.py::test_pending_entries_are_never_validated
# — the list cannot be used to hide once-red or once-green entries).
# All pairs still run in the local pytest oracle sweep regardless.
#
# r13: the three pairs built before the rotation
# (ann_recall_maintained, streaming_flagship_replay,
# skew_salted_join) seated directly in the head; everything
# registered AFTER the window was finalized (SWEEP_r13 was already
# running against the 142-pair registration) parks here for its r14
# seat, each with full-hash sf0.01 + sf1 + sf10 evidence recorded in
# SWEEP_r13.json on its registration day:
# - skew_hotcold_join — the hot/cold split join completing the skew
#   family;
# - dedup_ingest_novelty — dedup-at-ingest against the persisted
#   band index (one-shot batch semantics);
# - streaming_dedup_ingest_replay — the same index fed by the
#   foreachBatch sink, two sequential waves + compaction.
# - dedup_index_health — per-band row/bucket/hot-bucket stats of
#   the post-ingest compacted index (the LSH alerting surface).
_PENDING: list[str] = [
    "skew_hotcold_join",
    "dedup_ingest_novelty",
    "streaming_dedup_ingest_replay",
    "dedup_index_health",
    "dedup_ingest_clusters",
    "streaming_corpus_ingest_replay",
    "dedup_substring_exact",
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
