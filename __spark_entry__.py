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
# r15 window (50 seats), per the r14 verdict's items 1-4/8: the
# 12-entry parity/TPC-H floor; the FIVE first-seat pairs never
# driver-validated (the two r14 _PENDING pairs
# streaming_dedup_cluster_replay + curation_substring_contamination
# taking the seats the r14 verdict directed, plus this round's
# dedup_ingest_substring — the incremental exact-substring LSM
# index, verdict item 3 — multimodal_pdf_extract — verdict item 4 —
# and streaming_late_sideoutput_replay — verdict item 8); THREE
# re-seats whose semantics changed this round and whose prior greens
# therefore certify the OLD behavior (dedup_substring_exact — the
# ADVICE occurrence cap; crawl_to_training_shards and
# streaming_corpus_ingest_replay — the decontamination gate +
# disposition columns, verdict item 2); and 30 stalest-first refresh
# seats — the 24-entry r11-last-green cohort in full plus the 6
# alphabetically-first r12-last entries (last-green round ascending,
# alphabetical tiebreak). skew_salted_join leaves the window with its
# r14 fix certified (rule (b): one green + full-scale sweep rows).
# Annotations are machine-generated from CORRECTNESS_r*.json via
# scripts/green_history.py and list EVERY green round.
_DEFERRED = [
    "ann_index_health",                     # r13
    "ann_index_upsert_topk",                # r13
    "ann_ivf_pq_topk",                      # r9 r13
    "ann_recall_eval",                      # r9 r13
    "ann_recall_maintained",                # r13
    "anti_semi_join",                       # r1 r2 r6 r10 r13
    "attribution_multi_touch",              # r9 r11 r14
    "bloom_semijoin_prune",                 # r9 r13
    "bpe_encode_corpus",                    # r9 r13
    "bpe_vocab_merges",                     # r9 r13
    "bucketed_colocated_join",              # r13
    "cdc_apply_snapshot",                   # r1 r2 r3 r4 r5 r6 r10 r14
    "cdc_history_scd2",                     # r6 r7 r11 r14
    "corpus_datasheet",                     # r9 r13
    "corpus_snapshot_diff",                 # r7 r8 r12
    "csv_ingest_policy",                    # r13
    "curation_mixture_sample",              # r7 r8 r12
    "curation_pack_chunks",                 # r2 r3 r4 r5 r6 r10 r14
    "curation_pipeline_e2e",                # r2 r3 r4 r5 r6 r7 r10 r14
    "curation_stratified",                  # r3 r4 r5 r8 r12
    "ddl_entry_pipeline",                   # r2 r3 r4 r5 r8 r12
    "dedup_clusters",                       # r3 r4 r5 r8 r12
    "dedup_exact",                          # r1 r2 r3 r4 r5 r8 r12
    "dedup_index_health",                   # r14
    "dedup_ingest_clusters",                # r14
    "dedup_ingest_novelty",                 # r14
    "dedup_minhash_lsh",                    # r1 r2 r3 r4 r5 r6 r7 r10 r14
    "dedup_passage_exact",                  # r9 r13
    "dedup_pipeline_e2e",                   # r3 r4 r5 r6 r10 r14
    "dedup_semantic",                       # r7 r8 r12
    "dedup_simhash",                        # r1 r2 r3 r7 r10 r14
    "dedup_simhash_pairs",                  # r1 r2 r3 r7 r10 r14
    "deletion_propagation_audit",           # r9 r13
    "distinct_agg",                         # r1 r2 r6 r10 r13
    "embedding_hard_negatives",             # r9 r13
    "embedding_pq_codebook",                # r9 r13
    "event_funnel_steps",                   # r8 r9 r12
    "event_pattern_match",                  # r9 r13
    "full_outer_join_nulls",                # r1 r2 r6 r10 r14
    "intersect_keys",                       # r1 r2 r6 r10 r14
    "jsonl_corpus_roundtrip",               # r9 r13
    "kmeans_ivf_index",                     # r2 r3 r4 r5 r8 r12
    "multimodal_audio_decode",              # r5 r6 r7 r11 r14
    "multimodal_format_audit",              # r7 r8 r9 r13
    "multimodal_manifest",                  # r2 r3 r4 r5 r8 r12
    "multimodal_video_decode",              # r5 r6 r10 r11 r14
    "pivot_events",                         # r1 r2 r6 r10 r14
    "q10_returned_items",                   # r4 r5 r8 r12
    "q11_important_stock",                  # r9 r13
    "q12_shipping_priority_class",          # r9 r13
    "q13_customer_distribution",            # r4 r5 r8 r12
    "q14_promo_revenue",                    # r4 r5 r8 r12
    "q15_top_supplier",                     # r4 r5 r9 r13
    "q16_supplier_part_types",              # r9 r13
    "q17_small_quantity_revenue",           # r4 r5 r9 r13
    "q19_disjunctive_revenue",              # r4 r5 r8 r12
    "q1_pricing_summary",                   # r1 r2 r3 r4 r5 r6 r7 r10 r14
    "q20_potential_promotion",              # r9 r13
    "q21_waiting_supplier",                 # r5 r6 r10 r11 r14
    "q2_min_cost_supplier",                 # r9 r13
    "q3_shipping_priority",                 # r1 r3 r4 r5 r8 r12
    "q6_forecast_revenue",                  # r4 r5 r8 r12
    "q7_volume_shipping",                   # r4 r5 r8 r12
    "q8_market_share",                      # r4 r5 r8 r12
    "q9_product_type_profit",               # r9 r13
    "range_join_events",                    # r1 r2 r3 r4 r5 r8 r12
    "robots_txt_gate",                      # r8 r9 r12
    "rollup_agg",                           # r1 r2 r6 r10 r14
    "session_window_events",                # r1 r3 r4 r7 r10 r14
    "sessionization",                       # r2 r3 r4 r5 r8 r12
    "set_ops",                              # r1 r2 r6 r10 r14
    "similarity_ivf_topk",                  # r1 r2 r3 r4 r5 r6 r7 r10 r14
    "sketch_heavy_hitters",                 # r9 r13
    "skew_hotcold_join",                    # r14
    "skew_salted_agg",                      # r8 r9 r12
    "skew_salted_join",                     # r14
    "streaming_ann_upsert_replay",          # r13
    "streaming_attribution_replay",         # r9 r13
    "streaming_dedup_ingest_replay",        # r14
    "streaming_dedup_replay",               # r6 r7 r11 r14
    "streaming_enrichment_replay",          # r10 r11 r14
    "streaming_flagship_replay",            # r13
    "streaming_funnel_replay",              # r8 r9 r12
    "streaming_pattern_replay",             # r9 r13
    "streaming_scd2_replay",                # r11 r12
    "streaming_session_replay",             # r9 r13
    "string_math_funcs",                    # r1 r2 r6 r10 r14
    "table_profile_orders",                 # r8 r9 r12
    "text_bigram_typicality",               # r9 r13
    "text_bm25_term_scores",                # r8 r9 r12
    "text_chunk_windows",                   # r6 r7 r11 r14
    "text_filter_pipeline",                 # r1 r3 r4 r5 r8 r12
    "text_html_extract",                    # r6 r7 r11 r14
    "text_pii_scrub",                       # r6 r7 r11 r14
    "text_repetition_quality",              # r3 r4 r5 r6 r7 r10 r14
    "text_tfidf_top_terms",                 # r6 r7 r11 r14
    "text_token_stats",                     # r1 r3 r4 r5 r8 r12
    "text_winnow_fingerprints",             # r9 r13
    "url_canonicalize",                     # r6 r7 r11 r14
    "warc_ingest_extract",                  # r7 r8 r12
    "warc_to_corpus",                       # r8 r9 r12
    "web_link_pagerank",                    # r7 r8 r12
    "web_triangle_count",                   # r9 r10 r11 r14
    "zorder_layout_stats",                  # r8 r9 r12
]


# Queries added MID-ROUND after the 50-seat window was finalized
# (sweeps/bench already recorded against it) park here until the next
# rotation hands them seats. Distinct from _DEFERRED: a _PENDING entry
# has NEVER appeared in any CORRECTNESS_r*.json (guarded by
# tests/test_oracle_parity.py::test_pending_entries_are_never_validated
# — the list cannot be used to hide once-red or once-green entries).
# All pairs still run in the local pytest oracle sweep regardless.
#
# r15: both r14 _PENDING pairs took their first driver seats in this
# rotation, and the round's main new pairs were registered before the
# window was finalized and seated directly in the head. Built after
# the rotation (sweeps/bench already recording against the 154-pair
# registration):
# - pdf_to_corpus — PDF as a first-class corpus source format:
#   encode -> parse -> per-page reassembly -> language/quality/
#   fingerprint admission gates, the warc_to_corpus composition for
#   the crawl's second format. Full-hash evidence at sf0.001/sf0.01
#   + resumed sf1/sf10 sweep rows on registration day.
# - search_index_{topk,health,doc_topk,phrase} +
#   streaming_search_index_replay — the maintained LSM inverted text
#   index (operators/text_index.py, streaming/text_index_ingest.py):
#   per-term BM25 serving, live/base/delta health accounting,
#   summed-BM25 document ranking, exact phrase matching from
#   positional postings, and the streaming-ingest twin serving the
#   post-compaction base against the same oracle as the batch pair's
#   uncompacted reconciling read.
# - orc_corpus_roundtrip — ORC as a corpus source/sink format
#   (sources/orc.py): lossless explicit-schema roundtrip with
#   plan-guarded predicate pushdown.
# - streaming_substring_ingest_replay — the exact-substring anchor
#   index's streaming sink (streaming/substring_ingest.py),
#   completing the maintained-index quartet's streaming contract.
# Every pair: full-hash evidence at sf0.001/sf0.01 + sf1/sf10 sweep
# rows on registration day (SWEEP_r15, zero failures).
_PENDING: list[str] = [
    "pdf_to_corpus",
    "search_index_topk",
    "search_index_health",
    "streaming_search_index_replay",
    "search_index_doc_topk",
    "search_index_phrase",
    "orc_corpus_roundtrip",
    "streaming_substring_ingest_replay",
    "search_index_snippets",
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
