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
_DRIVER_GREEN = {
    "flagship_top_customers", "pricing_summary", "daily_order_summary",
    "daily_balance_pivot", "distinct_catalog", "scd1_latest_event",
    "customers_without_orders", "suppliers_with_returns",
    "price_band_range_join", "asof_last_purchase", "null_audit_orders",
    "quality_scan_lineitem", "dq_violation_report", "conditional_counts",
    "supplier_ranking_report", "top3_orders_per_segment",
    "event_value_deltas", "brand_set_ops", "rollup_returns",
    "scalar_functions", "json_extraction", "value_percentiles",
    "hourly_event_windows", "shipping_priority_top10",
    "revenue_by_nation_region", "per_user_event_profile",
    "null_safe_join_audit", "schema_evolution_union", "pivot_native_daily",
    "ranking_function_surface", "calendar_gap_fill", "fuzzy_name_match",
    "token_stats_by_source", "lang_id_confusion", "doc_quality_flags",
    "doc_fingerprints", "word_count_top20", "exact_dedup_docs",
    "ngram_jaccard_dups", "minhash_lsh_dups", "dedup_clusters",
    "simhash_dups", "cosine_topk_bruteforce", "knn_label_vote",
    "embedding_dup_pairs", "ann_lsh_topk", "ivf_ann_topk",
    "cube_order_stats", "unpivot_daily_metrics",
}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md section 2."""
    ordered = [n for n in QUERIES if n not in _DRIVER_GREEN]
    ordered += [n for n in QUERIES if n in _DRIVER_GREEN]
    return {n: QUERIES[n] for n in ordered}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each SQL-expressible query."""
    return dict(ORACLES)
