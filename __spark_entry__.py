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


# Queries with a green CORRECTNESS row from a prior round (pass or the
# declared rows-only check). The driver snapshots the FIRST 50 entries
# of queries(), so not-yet-checked and newly added queries are ordered
# first; long-green ones rotate to the back (their local parity tests
# still run every session).
#
# Round-4 rotation: r03 checked 50/50 green, so every query now has a
# driver row.  `per_group_trend_forecast` and `approx_sketches` gained
# real SQL oracles this round (were rows-only) — they are NOT listed
# here so they snapshot first and earn a hash-exact row in r04.
_DRIVER_GREEN = {
    'ann_lsh_topk', 'array_function_surface', 'asof_last_purchase',
    'benchmark_contamination', 'big_ticket_orders', 'brand_set_ops',
    'calendar_gap_fill', 'conditional_counts', 'cosine_topk_bruteforce',
    'cube_order_stats', 'customer_order_distribution',
    'customers_without_orders', 'daily_balance_pivot',
    'daily_order_summary', 'date_function_surface', 'dedup_clusters',
    'dedup_clusters_exact', 'distinct_catalog', 'doc_chunking',
    'doc_fingerprints', 'doc_length_histogram', 'doc_quality_flags',
    'doc_repetition_score', 'dq_violation_report', 'embedding_dup_pairs',
    'embedding_norms_pandas_udf', 'embedding_quantization_error',
    'event_delivery_dedup', 'event_value_deltas', 'exact_dedup_docs',
    'flagship_top_customers', 'frame_navigation_surface',
    'frame_sample_inventory', 'fuzzy_name_match', 'grouping_sets_report',
    'hourly_event_windows', 'hourly_moving_value', 'hourly_ohlc_resample',
    'ivf_ann_topk', 'json_extraction', 'knn_label_vote',
    'lang_id_confusion', 'map_function_surface', 'media_decode_meta',
    'media_inventory', 'min_cost_supplier', 'minhash_lsh_dups',
    'ngram_jaccard_dups', 'ntile_distribution_surface', 'null_audit_orders',
    'null_safe_join_audit', 'per_user_event_profile', 'pii_scrub_stats',
    'pivot_native_daily', 'price_band_range_join', 'pricing_summary',
    'priority_order_exists', 'quality_scan_lineitem',
    'ranking_function_surface', 'revenue_by_nation_region',
    'rich_idle_customers', 'rollup_returns', 'scalar_functions',
    'scd1_latest_event', 'scd2_dimension_report', 'schema_evolution_union',
    'segment_top_names_listagg', 'sentence_explode_udtf',
    'sequence_packing_stats', 'shipping_priority_top10', 'simhash_dups',
    'skew_salted_supplier_revenue', 'small_quantity_revenue',
    'snapshot_diff_cdc', 'stat_moments_by_flag', 'stratified_sample_counts',
    'streaming_session_windows', 'streaming_stateful_counts',
    'streaming_tumbling_counts', 'string_function_surface',
    'supplier_ranking_report', 'suppliers_with_returns', 'tfidf_top_terms',
    'token_stats_by_source', 'top3_orders_per_segment',
    'top_revenue_supplier', 'train_test_split_stats', 'unigram_entropy',
    'unigram_surprisal_score', 'unpivot_daily_metrics', 'user_sessions',
    'value_percentiles', 'value_trend_stats', 'variant_json_surface',
    'width_bucket_histogram', 'word_count_top20',
}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md section 2."""
    ordered = [n for n in QUERIES if n not in _DRIVER_GREEN]
    ordered += [n for n in QUERIES if n in _DRIVER_GREEN]
    return {n: QUERIES[n] for n in ordered}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each SQL-expressible query."""
    return dict(ORACLES)
