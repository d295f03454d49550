"""Extended window / statistical-aggregate surface.

Completes the analytic-function inventory beyond
ranking_function_surface: distribution functions (ntile,
percent_rank, cume_dist), frame-navigation (first/last/nth value),
ordered string aggregation, and the second-moment statistics
(variance, stddev, covariance, correlation).

Determinism: every ORDER BY carries a unique tie-break key (ntile on
ties is otherwise order-dependent); moment statistics round to 6
decimals — both engines run numerically stable one-pass algorithms
whose last-ulp noise the rounding absorbs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from logicash_etl_spark.queries.registry import query
from logicash_etl_spark.sources.readers import read_table


@query(
    "ntile_distribution_surface",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           ntile(4)       OVER w AS quartile,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist()    OVER w, 6) AS cume
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
    """,
)
def ntile_distribution_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions: quartile bucketing + rank
    percentiles per segment. The ORDER BY tie-breaks on the unique key
    — ntile assigns ties by position, so without it two runs can put
    equal balances in different quartiles."""
    c = read_table(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey", "c_mktsegment",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


@query(
    "frame_navigation_surface",
    oracle="""
    SELECT DISTINCT c_mktsegment,
           first_value(c_name) OVER w AS poorest,
           last_value(c_name)  OVER w AS richest,
           nth_value(c_name, 2) OVER w AS second_poorest
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def frame_navigation_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last/nth_value with an explicit full-partition frame —
    the default frame stops at CURRENT ROW, which silently turns
    last_value into the running row; pinning the frame is the
    correctness trap this query guards."""
    c = read_table(spark, sf_dir, "customer")
    w = (
        W.partitionBy("c_mktsegment")
        .orderBy("c_acctbal", "c_custkey")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return c.select(
        "c_mktsegment",
        F.first("c_name").over(w).alias("poorest"),
        F.last("c_name").over(w).alias("richest"),
        F.nth_value("c_name", 2).over(w).alias("second_poorest"),
    ).distinct()


@query(
    "segment_top_names_listagg",
    oracle="""
    WITH ranked AS (
      SELECT c_mktsegment, c_name,
             row_number() OVER (PARTITION BY c_mktsegment
                                ORDER BY c_acctbal DESC, c_custkey) AS rk
      FROM customer
    )
    SELECT c_mktsegment,
           string_agg(c_name, ',' ORDER BY c_name) AS top_names
    FROM ranked WHERE rk <= 5
    GROUP BY c_mktsegment
    """,
)
def segment_top_names_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (LISTAGG analog): top-5 balances per
    segment, names joined in sorted order. collect_list order is
    partition-dependent in Spark, so the sort happens in array_sort —
    never trust collect order for a deterministic output."""
    c = read_table(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return (
        c.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .groupBy("c_mktsegment")
        .agg(F.array_join(F.array_sort(F.collect_list("c_name")), ",").alias("top_names"))
    )


@query(
    "stat_moments_by_flag",
    oracle="""
    SELECT l_returnflag,
           round(stddev_samp(l_quantity), 6) AS sd_qty,
           round(var_samp(l_quantity), 6) AS var_qty,
           round(covar_samp(l_quantity, l_extendedprice), 4) AS cov_qty_price,
           round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def stat_moments_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second-moment statistics: sample stddev/variance, covariance,
    correlation — the profile columns a feature store materializes.
    All are single-pass mergeable aggregates (Welford-style partials),
    so at 100 TB they cost the same shuffle as a SUM."""
    li = read_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_quantity"), 6).alias("sd_qty"),
        F.round(F.var_samp("l_quantity"), 6).alias("var_qty"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias("cov_qty_price"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
    )
