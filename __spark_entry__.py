"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

The actual catalog lives in ``logicash_etl_spark.queries`` — one
registered (query, oracle) pair per implemented operator from
SURVEY.md section 2; tests/test_oracle_parity.py runs the identical
comparison locally.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from logicash_etl_spark.queries import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The reference's headline report — "top ATMs by money moved"
    (glue_jobs/etl_job.py:147-158) — transposed onto the fixture star
    schema: scan -> filter -> broadcast join -> hash agg -> top-k.
    """
    return QUERIES["flagship_top_customers"](spark, "/root/testdata/sf0.001")


# Queries with a green CORRECTNESS row from a prior round. The driver
# snapshots the FIRST 50 entries of queries(), so changed and
# not-yet-checked queries are ordered first; long-green ones rotate to
# the back (their local parity tests still run every session).
#
# Round-7 rotation: all 50 CORRECTNESS_r06 rows join the set (191
# total green across r1-r6, zero failures ever). The only queries
# without a driver row are the fourteen in _CHECK_FIRST below — they
# are ordered FIRST this round so CORRECTNESS_r07 finally records
# them, making the ledger 205/205 driver-confirmed. _CHANGED_R7 lists
# green queries whose implementation changed this round; they follow
# immediately so the snapshot re-confirms them.
_DRIVER_GREEN = {
    'ab_test_report', 'acf_daily_values', 'ann_lsh_topk',
    'approx_sketches', 'array_function_surface', 'asof_last_purchase',
    'audio_chunk_inventory', 'benchmark_contamination',
    'benford_first_digit_audit', 'big_ticket_orders',
    'bilateral_trade_volume', 'bloom_history_dedup',
    'bloom_join_prune_stats', 'bloom_pruned_revenue',
    'bpe_fertility_by_lang', 'bpe_merges_report', 'bpe_token_counts',
    'brand_set_ops', 'calendar_gap_fill', 'cms_heavy_hitters',
    'collocation_lift_top20', 'conditional_counts', 'conversion_funnel',
    'copurchase_lift_top20', 'corrupt_record_audit',
    'cosine_topk_bruteforce', 'cube_order_stats', 'cuped_adjusted_ab',
    'curation_funnel_report', 'customer_order_distribution',
    'customers_without_orders', 'cusum_changepoints',
    'daily_balance_pivot', 'daily_order_summary', 'date_function_surface',
    'dedup_clusters', 'dedup_clusters_exact', 'discount_band_revenue',
    'disjunctive_predicate_revenue', 'distinct_catalog', 'doc_chunking',
    'doc_fingerprints', 'doc_length_histogram', 'doc_quality_flags',
    'doc_repetition_score', 'domain_mixture_weights',
    'dq_violation_report', 'embedding_centroid_drift',
    'embedding_dup_pairs', 'embedding_norms_pandas_udf',
    'embedding_quantization_error', 'event_delivery_dedup',
    'event_value_deltas', 'exact_dedup_docs', 'exact_dup_rate_by_source',
    'exact_substring_cut_stats', 'exact_substring_dedup_apply',
    'excess_share_suppliers', 'fd_discovery_report',
    'flagship_top_customers', 'frame_navigation_surface',
    'frame_sample_inventory', 'fs_linkage_report', 'fuzzy_name_match',
    'golden_record_report', 'gopher_quality_suite', 'grouping_sets_report',
    'hard_negative_mining', 'hll_partial_merge_counts',
    'hourly_event_windows', 'hourly_moving_value', 'hourly_ohlc_resample',
    'important_parts_value', 'incremental_join_maintenance',
    'incremental_lot_dedup', 'incremental_minhash_dedup', 'ivf_ann_topk',
    'jaccard_threshold_sweep', 'json_extraction', 'key_skew_report',
    'knn_label_vote', 'lang_id_confusion', 'leakage_safe_split_report',
    'lot_datasource_rollup', 'map_function_surface', 'media_decode_meta',
    'media_inventory', 'media_phash_dups', 'min_cost_supplier',
    'minhash_lsh_dups', 'mixture_build_plan', 'nation_market_share',
    'nation_trade_communities', 'nation_trade_hits',
    'nation_trade_pagerank', 'near_dup_keep_decisions',
    'ngram_diversity_by_source', 'ngram_jaccard_dups',
    'ntile_distribution_surface', 'null_audit_orders',
    'null_safe_join_audit', 'order_price_consistency',
    'parquet_schema_evolution_scan', 'per_group_trend_forecast',
    'per_user_event_profile', 'pii_scrub_stats', 'pit_event_enrichment',
    'pivot_native_daily', 'pq_ann_topk', 'prefix_jaccard_dups',
    'price_band_range_join', 'pricing_summary', 'priority_order_exists',
    'product_margin_by_nation_year', 'promo_revenue_share',
    'quality_scan_lineitem', 'quantile_sketch_merge',
    'ranking_function_surface', 'recursive_cte_reachability',
    'repeated_passage_report', 'repeated_substring_spans',
    'returned_item_report', 'revenue_by_nation_region',
    'revenue_concentration_gini', 'rich_idle_customers',
    'right_to_erasure_audit', 'robust_value_stats',
    'rolling_zscore_anomalies', 'rollup_returns', 'rrf_hybrid_topk',
    'scalar_functions', 'scd1_latest_event', 'scd2_dimension_report',
    'schema_evolution_union', 'segment_top_names_listagg',
    'semantic_dedup_stats', 'sentence_explode_udtf',
    'sequence_packing_stats', 'shipping_priority_top10', 'simhash_dups',
    'skew_salted_supplier_revenue', 'small_quantity_revenue',
    'snapshot_diff_cdc', 'stat_moments_by_flag',
    'stratified_sample_counts', 'stream_static_enrich',
    'streaming_dedup_counts', 'streaming_incremental_dedup',
    'streaming_interval_join', 'streaming_jittered_dedup',
    'streaming_late_data_audit', 'streaming_outer_interval_join',
    'streaming_session_windows', 'streaming_stateful_counts',
    'streaming_tumbling_counts', 'streaming_upsert_scd1',
    'string_function_surface', 'supplier_count_by_part',
    'supplier_ranking_report', 'suppliers_with_returns',
    'temperature_resample_counts', 'tfidf_top_terms',
    'token_balanced_shards', 'token_budget_sample',
    'token_budget_sample_bpe', 'token_stats_by_source',
    'top3_orders_per_segment', 'top_revenue_supplier',
    'trade_community_modularity', 'trade_k_core', 'trade_link_prediction',
    'trade_reach_hops', 'trade_triangle_stats', 'train_test_split_stats',
    'unigram_entropy', 'unigram_surprisal_score', 'unpivot_daily_metrics',
    'user_sessions', 'value_drift_psi', 'value_outlier_mad',
    'value_percentiles', 'value_trend_stats', 'variant_json_surface',
    'vocab_drift_psi', 'waiting_suppliers', 'weekly_retention_cohorts',
    'weekly_rollup_from_daily', 'weighted_sample_topk',
    'width_bucket_histogram', 'winnowing_fingerprints', 'word_count_top20',
}

# Round-6's deliberate overflow: the 14 queries that have passed the
# identical local parity comparison every session (each with an
# independent exactness proof — see COVERAGE.md Round 6) but have no
# driver CORRECTNESS row yet. Ordered FIRST for round 7.
_CHECK_FIRST = [
    "kmv_set_overlap", "kmv_partial_merge", "incremental_agg_maintenance",
    "ams_f2_estimate", "doc_stats_map_in_arrow", "format_roundtrip_scan",
    "user_active_coverage", "ewma_event_value", "session_peak_concurrency",
    "part_name_edit_pairs", "event_transition_matrix",
    "pareto_part_frontier", "trade_min_cost_paths", "bigram_surprisal_score",
]

# Driver-green queries whose implementation (or plan shape) changed in
# round 7 — re-confirmed inside the 50-row snapshot.
_CHANGED_R7 = [
    # broadcast-policy sweep (forced hints dropped on scale-
    # proportional frames; plan-only at bench SF) + exact-rational
    # prefix filter + hits normalizer guard
    "right_to_erasure_audit", "prefix_jaccard_dups", "nation_trade_hits",
    "bilateral_trade_volume", "nation_market_share",
    "product_margin_by_nation_year", "returned_item_report",
    "supplier_count_by_part",
    # arithmetic/domain fixes take the slots of promo_revenue_share
    # and disjunctive_predicate_revenue (both hint-only changes,
    # pinned by their plan tests + local parity):
    # - calendar_gap_fill: dims-domain fix (sf0.001-visible)
    # - pricing_summary: precision-38 overflow in the charge chain
    #   (sf1-visible 1-ulp sum divergence)
    "calendar_gap_fill", "pricing_summary", "excess_share_suppliers",
    "big_ticket_orders", "top_revenue_supplier", "waiting_suppliers",
    "revenue_concentration_gini", "revenue_by_nation_region",
    "shipping_priority_top10",
    # grouped_prefix_sum hint drop (AQE decides at runtime)
    "robust_value_stats", "sequence_packing_stats", "token_budget_sample",
    "token_budget_sample_bpe", "mixture_build_plan", "curation_funnel_report",
    # drain-lifecycle rework: persistent checkpoints + parquet sinks
    # (incremental warm re-drains; memory sinks retired)
    "streaming_tumbling_counts", "streaming_session_windows",
    "streaming_stateful_counts", "streaming_dedup_counts",
    "streaming_interval_join", "streaming_upsert_scd1",
    "stream_static_enrich", "streaming_incremental_dedup",
    "streaming_late_data_audit", "streaming_outer_interval_join",
    "streaming_jittered_dedup",
    # join-free source rollup / unhinted frequency joins
    "repeated_passage_report", "copurchase_lift_top20",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md section 2."""
    first = [n for n in _CHECK_FIRST if n in QUERIES]
    first += [n for n in _CHANGED_R7 if n in QUERIES and n not in first]
    head = set(first)
    ordered = list(first)
    ordered += [n for n in QUERIES if n not in _DRIVER_GREEN and n not in head]
    ordered += [n for n in QUERIES if n in _DRIVER_GREEN and n not in head]
    return {n: QUERIES[n] for n in ordered}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each SQL-expressible query."""
    return dict(ORACLES)
