"""Query layer: the reference's serving surface (REST endpoints +
ES-demo query set, SURVEY §2.11) plus the engine's analytics/extension
queries, each paired with a DuckDB oracle for correctness checking.
"""

from .queries import REGISTRY, oracle_sql, queries
from . import llm_queries  # noqa: F401 — populates REGISTRY on import
from . import log_queries  # noqa: F401 — populates REGISTRY on import
from . import cdc_queries  # noqa: F401 — populates REGISTRY on import

#: Gate-visibility ordering. CORRECTNESS_r02 recorded rows for exactly
#: the first 50 registered queries (module registration order), so a
#: capped harness would starve whole families registered later. The
#: registry is re-ordered so every operator family — ES/serving,
#: TPC-H, log split, CDC, LLM dedup/similarity/text, multimodal,
#: warehouse, and the end-to-end streaming parities — lands inside the
#: first 50; the remainder (verified equally, just later) follows.
#: r5 rotation — the FINAL visibility rotation. The union of
#: CORRECTNESS_r01–r04 covers 105 of the 125 pre-r5 registry queries;
#: ALL 25 never-driver-checked names sit inside the top-50 this
#: round — the 20 backlog queries (text-stats family,
#: quality/repetition bands, dup_clusters, the sampling/export
#: family, frame sampling, feature extraction, the IVF recall curve,
#: two streaming parities) plus the FIVE queries new in r5 (quality
#: expectations, warehouse compaction, z-order lookup, auto-banded
#: semantic dedup, incremental-IVF append) — so CORRECTNESS_r05
#: completes driver verification of every registered query at least
#: once. The other 25 slots are one already-green sentinel per
#: operator family (a family-wide regression still flags inside the
#: cap), preferring queries whose code was touched THIS round
#: (clustered_point_lookup's derived key, table_profile's empty-frame
#: coalesce, the scd2_sink crash-safe swap, knn_join's collect cap) so
#: the driver re-verifies the edits, not just the replica.
_PRIORITY = [
    # serving / DAU sentinels (A1, endpoint)
    "dau_total_by_day", "dau_realtime_endpoint",
    # log-split sentinels (P4/P5 projection, P9 multiplex)
    "log_split_page", "multiplex_route_counts",
    # CDC sentinels (P10/P11 routing, K4 upsert; the SCD2 family's
    # sentinel is streaming_scd2_parity below, which compares against
    # the batch operator and so covers both)
    "cdc_route_counts", "cdc_dim_snapshot",
    # NEW this round: byte-exact PCM16 audio features
    "doc_audio_windows",
    # ES query-surface sentinel (A3)
    "stats_by_item_segment",
    # joins / rollups / TPC-H / extension sentinels
    "order_wide_join", "hourly_window_rollup", "shipping_priority",
    "events_asof_last_order",
    # NEW this round (never driver-checked): warehouse maintenance +
    # quality gate + z-order skipping
    "events_quality_expectations", "warehouse_compaction_roundtrip",
    "zordered_two_dim_lookup",
    # never-driver-checked: text-stats / quality family
    "doc_gopher_filters", "doc_tfidf_top_terms", "doc_top_bigrams",
    "doc_bpe_token_stats", "doc_lexical_commonness",
    "doc_quality_bands", "doc_repetition_bands",
    # never-driver-checked: dedup / cluster / split family
    "doc_dup_clusters", "doc_hash_split", "doc_chunk_dedup_stride",
    # never-driver-checked: sampling / export family
    "doc_stratified_sample", "doc_temperature_resample",
    "doc_exact_k_sample", "doc_training_shards", "doc_source_mix",
    # never-driver-checked: multimodal / embedding family
    "doc_frame_sample", "emb_feature_extract", "emb_ivf_recall_curve",
    # LLM dedup/similarity sentinels (emb_semantic_dedup + emb_knn_join
    # re-verify this round's LSH auto-banding and collect-cap edits),
    # plus the NEW auto-banded twin and incremental-IVF queries
    "doc_exact_dedup", "doc_minhash_near_dup",
    "corpus_curation_funnel_v2", "emb_semantic_dedup",
    "emb_semantic_dedup_auto", "emb_knn_join",
    "emb_ivf_append_topk", "emb_truncated_overlap",
    "doc_lm_perplexity", "doc_pii_scrub",
    # warehouse sentinels (clustered_point_lookup + events_table_profile
    # re-verify this round's derived-key and empty-frame edits)
    "bucketed_colocated_join", "clustered_point_lookup",
    "events_table_profile",
    # streaming parities — the two never-driver-checked ones plus the
    # dedup sentinel and the scd2 parity (re-verifies the crash-safe
    # snapshot swap); last in the top-50 block: if the cap is a count
    # they're inside it, if a time budget the cheap queries above have
    # already banked rows
    "streaming_dau_dedup_parity", "streaming_scd2_parity",
    "streaming_heavy_hitters_parity", "streaming_state_profile_parity",
    # tail (51+): green in r2–r4 driver artifacts, still verified every
    # session by scripts/check_oracle.py (full registry) and pytest
    "min_cost_supplier", "doc_incremental_near_dup", "doc_binary_meta",
    "emb_ivf_topk", "doc_importance_resample", "cdc_scd2_history",
    "doc_quality_adaptive",
    "doc_heavy_hitters_sketch", "cdc_scd2_asof_enrich",
    "value_percentiles",
    "orders_events_range_join", "product_profit_by_nation_year",
    "important_stock_value", "excess_stock_suppliers",
    "corpus_curation_funnel", "emb_ivf_knn_join",
    "emb_ivf_multiprobe_topk", "emb_near_dup_lsh",
    "doc_winnow_fingerprints", "doc_overlap_spans",
    "doc_sequence_packing", "doc_decontaminate", "doc_chunk_dedup",
    "dau_warehouse_day_slice", "doc_remove_dup_spans",
    "streaming_order_wide_parity", "streaming_curation_parity",
    "user_sessions",
    "dau_enriched", "log_split_actions", "term_exact_update_view",
    "highlight_match", "json_props_extract", "doc_simhash",
    "emb_int8_quantize", "pricing_summary", "revenue_by_nation",
    "doc_lang_id", "filtered_sorted_paginated", "doc_token_stats",
    "emb_cosine_topk",
    "dau_by_hour", "session_entry_first_daily", "get_by_id",
    "error_routing", "log_split_error", "log_split_displays",
    "log_split_start", "cdc_op_normalize", "cdc_fact_rows",
    "acctbal_bands", "relabel_segment", "top_k_grouped_avg",
    "delete_by_id_view", "upsert_single_view", "to_json_serialize",
    "streaming_cdc_dim_parity", "streaming_multiplex_parity",
    "streaming_hourly_rollup_parity",
    "streaming_user_sessions_parity", "nation_acctbal_salted",
]


def _reorder() -> None:
    # a renamed/misspelled _PRIORITY entry must fail loudly — a silent
    # skip would starve a family from the capped gate with no signal
    unknown = set(_PRIORITY) - set(REGISTRY)
    assert not unknown, f"_PRIORITY names missing from REGISTRY: {sorted(unknown)}"
    ordered = {n: REGISTRY[n] for n in _PRIORITY}
    for n, spec in REGISTRY.items():
        if n not in ordered:
            ordered[n] = spec
    REGISTRY.clear()
    REGISTRY.update(ordered)


_reorder()

__all__ = ["REGISTRY", "queries", "oracle_sql"]
