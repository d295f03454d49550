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
# Round-6 rotation: every r05-green query joins the set; NOT listed —
# and therefore ordered first for CORRECTNESS_r06 — are the 62
# round-6 additions and changed implementations (late-round families:
# CUSUM, HITS, RRF fusion, FS linkage + golden-record MDM, ACF,
# mapInArrow, streaming late-data audit + left-outer interval join,
# join-delta IVM, Welch/CUPED, BPE fertility, robust stats, FD
# discovery, Benford, AMS F2, modularity, erasure audit, corrupt
# records, mergeSchema, leakage-safe split; plus the earlier-session
# graph/drift/dedup additions and the r5-green queries whose
# implementations changed). 62 exceeds the driver's 50-row snapshot;
# _CHECK_LAST below picks the twelve that wait for r07.
_DRIVER_GREEN = {
    'ann_lsh_topk', 'approx_sketches', 'array_function_surface',
    'asof_last_purchase', 'audio_chunk_inventory',
    'benchmark_contamination', 'big_ticket_orders',
    'bilateral_trade_volume', 'bloom_join_prune_stats',
    'bloom_pruned_revenue', 'bpe_merges_report', 'bpe_token_counts',
    'brand_set_ops', 'calendar_gap_fill', 'cms_heavy_hitters',
    'collocation_lift_top20', 'conditional_counts', 'conversion_funnel',
    'cosine_topk_bruteforce', 'cube_order_stats',
    'customer_order_distribution', 'customers_without_orders',
    'daily_balance_pivot', 'daily_order_summary',
    'date_function_surface', 'dedup_clusters', 'dedup_clusters_exact',
    'discount_band_revenue', 'disjunctive_predicate_revenue',
    'distinct_catalog', 'doc_chunking', 'doc_fingerprints',
    'doc_length_histogram', 'doc_quality_flags', 'doc_repetition_score',
    'domain_mixture_weights', 'dq_violation_report',
    'embedding_dup_pairs', 'embedding_norms_pandas_udf',
    'embedding_quantization_error', 'event_delivery_dedup',
    'event_value_deltas', 'exact_dedup_docs',
    'exact_dup_rate_by_source', 'excess_share_suppliers',
    'flagship_top_customers', 'frame_navigation_surface',
    'frame_sample_inventory', 'fuzzy_name_match',
    'gopher_quality_suite', 'grouping_sets_report',
    'hll_partial_merge_counts', 'hourly_event_windows',
    'hourly_moving_value', 'hourly_ohlc_resample',
    'important_parts_value', 'incremental_lot_dedup', 'ivf_ann_topk',
    'jaccard_threshold_sweep', 'json_extraction', 'knn_label_vote',
    'lang_id_confusion', 'lot_datasource_rollup',
    'map_function_surface', 'media_decode_meta', 'media_inventory',
    'media_phash_dups', 'min_cost_supplier', 'minhash_lsh_dups',
    'nation_market_share', 'nation_trade_pagerank',
    'near_dup_keep_decisions', 'ngram_diversity_by_source',
    'ngram_jaccard_dups', 'ntile_distribution_surface',
    'null_audit_orders', 'null_safe_join_audit',
    'order_price_consistency', 'per_group_trend_forecast',
    'per_user_event_profile', 'pii_scrub_stats', 'pivot_native_daily',
    'price_band_range_join', 'pricing_summary', 'priority_order_exists',
    'product_margin_by_nation_year', 'promo_revenue_share',
    'quality_scan_lineitem', 'quantile_sketch_merge',
    'ranking_function_surface', 'repeated_passage_report',
    'returned_item_report', 'revenue_by_nation_region',
    'rich_idle_customers', 'rollup_returns', 'scalar_functions',
    'scd1_latest_event', 'scd2_dimension_report',
    'schema_evolution_union', 'segment_top_names_listagg',
    'semantic_dedup_stats', 'sentence_explode_udtf',
    'shipping_priority_top10', 'simhash_dups',
    'skew_salted_supplier_revenue', 'small_quantity_revenue',
    'snapshot_diff_cdc', 'stat_moments_by_flag',
    'stratified_sample_counts', 'stream_static_enrich',
    'streaming_dedup_counts', 'streaming_interval_join',
    'streaming_session_windows', 'streaming_stateful_counts',
    'streaming_tumbling_counts', 'streaming_upsert_scd1',
    'string_function_surface', 'supplier_count_by_part',
    'supplier_ranking_report', 'suppliers_with_returns',
    'temperature_resample_counts', 'tfidf_top_terms',
    'token_balanced_shards',
    'token_stats_by_source',
    'top3_orders_per_segment', 'top_revenue_supplier',
    'train_test_split_stats', 'unigram_entropy',
    'unigram_surprisal_score', 'unpivot_daily_metrics', 'user_sessions',
    'value_outlier_mad', 'value_percentiles', 'value_trend_stats',
    'variant_json_surface', 'waiting_suppliers',
    'weekly_retention_cohorts', 'weekly_rollup_from_daily',
    'width_bucket_histogram', 'winnowing_fingerprints',
    'word_count_top20',
}


# Deliberate overflow set: these fourteen wait for CORRECTNESS_r07 —
# chosen because each carries an INDEPENDENT exactness proof beyond
# the local parity test (kmv/ams: in-query merge==direct / exact-F2
# ground-truth columns; incremental_agg: CDC vs recomputed oracle
# unit test; arrow/roundtrip: byte-exact scan pins; coverage/ewma/
# peak-concurrency: unit tests + early-r6 local parity, unchanged
# since). Everything CHANGED in r6 and every new family stays inside
# the snapshot.
_CHECK_LAST = [
    "kmv_set_overlap", "kmv_partial_merge", "incremental_agg_maintenance",
    "ams_f2_estimate", "doc_stats_map_in_arrow", "format_roundtrip_scan",
    "user_active_coverage", "ewma_event_value", "session_peak_concurrency",
    "part_name_edit_pairs", "event_transition_matrix",
    "pareto_part_frontier", "trade_min_cost_paths", "bigram_surprisal_score",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md section 2."""
    last = set(_CHECK_LAST)
    ordered = [n for n in QUERIES if n not in _DRIVER_GREEN and n not in last]
    ordered += [n for n in _CHECK_LAST if n in QUERIES]
    ordered += [n for n in QUERIES if n in _DRIVER_GREEN]
    return {n: QUERIES[n] for n in ordered}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each SQL-expressible query."""
    return dict(ORACLES)
