"""Behavioral / robust-statistics analytics over the events and
orders tables: conversion funnel, retention cohorts, MAD outlier
flags, and an order-vs-lineitem financial consistency audit.

These are the product-analytics shapes the reference's gold layer
feeds (top-N reports, daily rollups — glue_jobs/etl_job.py:147-158);
funnels and cohorts are their natural extensions once events carry
timestamps. All four are pure JVM window/join/agg plans with DuckDB
oracles.

Determinism notes: stage boundaries use strict ts inequalities
identically on both sides; quantile-derived thresholds are ROUNDED
before any row comparison so an interpolation ulp cannot flip a
boundary row; money stays decimal until the output edge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from logicash_etl_spark.functions.money import money
from logicash_etl_spark.queries.registry import query
from logicash_etl_spark.sources.readers import read_table


@query(
    "conversion_funnel",
    oracle="""
    WITH v AS (
      SELECT user_id, min(ts) AS t FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ), c AS (
      SELECT e.user_id, min(e.ts) AS t
      FROM events e JOIN v ON e.user_id = v.user_id AND e.ts > v.t
      WHERE e.event_type = 'click' GROUP BY e.user_id
    ), p AS (
      SELECT e.user_id, min(e.ts) AS t
      FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.t
      WHERE e.event_type = 'purchase' GROUP BY e.user_id
    )
    SELECT (SELECT count(*) FROM v) AS n_viewed,
           (SELECT count(*) FROM c) AS n_clicked_after_view,
           (SELECT count(*) FROM p) AS n_purchased_after_click
    """,
)
def conversion_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel view -> click -> purchase: a user
    advances a stage only with an event STRICTLY AFTER their first
    event of the previous stage.

    Plan: three stage frames, each a groupBy(user) min-timestamp over
    a pushed-down event_type filter, chained by an equi-join on
    user_id with a range predicate — every join is keyed on user_id,
    so at scale all three stages share one hash partitioning (no
    per-user windows over the full event stream, no self-join on the
    raw table). Final counts are single-row aggregates."""
    ev = read_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")

    def stage(event_type: str, after: DataFrame | None) -> DataFrame:
        e = ev.filter(F.col("event_type") == event_type)
        if after is not None:
            e = e.join(
                after.select("user_id", F.col("t").alias("__prev")), on="user_id"
            ).filter(F.col("ts") > F.col("__prev"))
        return e.groupBy("user_id").agg(F.min("ts").alias("t"))

    v = stage("view", None)
    c = stage("click", v)
    p = stage("purchase", c)
    counts = [
        df.agg(F.count("*").alias(name))
        for df, name in (
            (v, "n_viewed"),
            (c, "n_clicked_after_view"),
            (p, "n_purchased_after_click"),
        )
    ]
    return counts[0].crossJoin(counts[1]).crossJoin(counts[2])


@query(
    "weekly_retention_cohorts",
    oracle="""
    WITH firsts AS (
      SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
      FROM events GROUP BY user_id
    )
    SELECT cohort_week,
           CAST(datediff('day', cohort_week, date_trunc('week', e.ts)) / 7 AS BIGINT)
             AS week_offset,
           count(DISTINCT e.user_id) AS n_active
    FROM events e JOIN firsts USING (user_id)
    GROUP BY 1, 2
    """,
)
def weekly_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic retention matrix: users bucketed by first-seen week
    (cohort), counted distinct in each subsequent activity week
    (offset in whole weeks). Both weeks are Monday-truncated on both
    engines, so offsets are exact integers — no timezone or partial-
    week drift. Plan: one groupBy(user) for cohorts, one join keyed on
    user_id, one distinct-count agg — all on the same key."""
    ev = read_table(spark, sf_dir, "events").select("user_id", "ts")
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    return (
        ev.join(firsts, on="user_id")
        .select(
            "user_id",
            "cohort_week",
            (
                F.datediff(F.date_trunc("week", F.col("ts")), F.col("cohort_week")) / 7
            )
            .cast("bigint")
            .alias("week_offset"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count_distinct("user_id").alias("n_active"))
    )


@query(
    "value_outlier_mad",
    oracle="""
    WITH med AS (
      SELECT event_type, round(quantile_cont(value, 0.5), 6) AS med
      FROM events GROUP BY event_type
    ), mad AS (
      SELECT e.event_type,
             round(quantile_cont(abs(e.value - m.med), 0.5), 6) AS mad
      FROM events e JOIN med m USING (event_type)
      GROUP BY e.event_type
    )
    SELECT e.event_type,
           count(*) AS n,
           min(m.med) AS med,
           min(d.mad) AS mad,
           CAST(SUM(CASE WHEN abs(e.value - m.med) > 3 * 1.4826 * d.mad
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM events e
      JOIN med m USING (event_type)
      JOIN mad d USING (event_type)
    GROUP BY e.event_type
    """,
)
def value_outlier_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-group outlier detection via Median Absolute
    Deviation: flag |x - median| > 3 * 1.4826 * MAD (the normal-
    consistency constant). Unlike mean/stddev, median/MAD do not let
    the outliers drag the threshold toward themselves.

    Needs two dependent exact quantiles -> two passes over the group
    (median, then median of absolute deviations), both tiny aggregates
    joined back broadcast-style. Both quantiles are ROUNDED to 6dp
    before the comparison — the rounded threshold is identical bits on
    both engines, so no boundary row can flip on an interpolation ulp.
    At 100 TB the exact quantiles swap for percentile_approx and the
    same plan holds (sketches merge; two passes stay two passes)."""
    ev = read_table(spark, sf_dir, "events").select("event_type", "value")
    med = ev.groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(0.5)), 6).alias("med")
    )
    dev = ev.join(F.broadcast(med), on="event_type")
    mad = dev.groupBy("event_type").agg(
        F.round(F.percentile(F.abs(F.col("value") - F.col("med")), F.lit(0.5)), 6).alias(
            "mad"
        )
    )
    return (
        dev.join(F.broadcast(mad), on="event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.min("med").alias("med"),
            F.min("mad").alias("mad"),
            F.sum(
                (
                    F.abs(F.col("value") - F.col("med"))
                    > 3 * 1.4826 * F.col("mad")
                ).cast("int")
            )
            .cast("bigint")
            .alias("n_outliers"),
        )
    )


@query(
    "order_price_consistency",
    oracle="""
    WITH per_order AS (
      SELECT l_orderkey,
             SUM(CAST(round(l_extendedprice * (1 - l_discount) * (1 + l_tax), 2)
                      AS DECIMAL(18,2))) AS line_total
      FROM lineitem GROUP BY l_orderkey
    )
    SELECT o_orderstatus,
           count(*) AS n_orders,
           CAST(SUM(CASE WHEN abs(CAST(o_totalprice AS DECIMAL(18,2)) - line_total)
                              > 5.00 THEN 1 ELSE 0 END) AS BIGINT) AS n_mismatch
    FROM orders JOIN per_order ON l_orderkey = o_orderkey
    GROUP BY o_orderstatus
    """,
)
def order_price_consistency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Financial consistency audit: does each order's header total
    equal the sum of its lines' net amounts (price * (1-discount) *
    (1+tax))? The per-line amount is rounded to cents THEN decimal-
    summed, so the per-order total is order-independent and identical
    across engines; mismatch = |header - lines| > $5. This is the
    reconciliation DQ check a warehouse runs between fact grains
    (reference analog: qa totals validation, validate_data_fast.py).

    Plan: one groupBy(orderkey) over lineitem (map-side partial sums),
    one join to orders on the same key, one tiny rollup by status."""
    li = read_table(spark, sf_dir, "lineitem")
    per_order = li.groupBy("l_orderkey").agg(
        F.sum(
            money(
                F.round(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * (1 + F.col("l_tax")),
                    2,
                )
            )
        ).alias("line_total")
    )
    o = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", money("o_totalprice").alias("__total")
    )
    return (
        o.join(per_order, on=[F.col("o_orderkey") == F.col("l_orderkey")])
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(
                (F.abs(F.col("__total") - F.col("line_total")) > 5.00).cast("int")
            )
            .cast("bigint")
            .alias("n_mismatch"),
        )
    )
