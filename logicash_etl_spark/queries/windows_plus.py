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


@query(
    "rolling_zscore_anomalies",
    oracle="""
    WITH c AS (
      SELECT user_id, ts, event_id,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events
    ), framed AS (
      SELECT user_id, cents,
             CAST(count(*) OVER w AS BIGINT) AS n,
             CAST(COALESCE(SUM(cents)         OVER w, 0) AS BIGINT) AS s,
             CAST(COALESCE(SUM(cents * cents) OVER w, 0) AS BIGINT) AS sq
      FROM c
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING)
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN n >= 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_judged,
           CAST(SUM(CASE WHEN n >= 5
                          AND (n * cents - s) * (n * cents - s)
                              > 9 * (n * sq - s * s)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies
    FROM framed
    GROUP BY user_id
    """,
)
def rolling_zscore_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user rolling z-score anomaly detection: each event is judged
    against the trailing window of its user's 10 PREVIOUS events
    (ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING — the current row is
    excluded so an outlier cannot vote on itself), flagged when
    |x - mean| > 3 * stddev, judged only once >= 5 priors exist.

    Entirely INTEGER arithmetic: values become exact cents, and the
    z-test is algebraically cleared of division and square roots —
    |x - s/n| > 3 * sqrt((n*sq - s^2)) / n  <=>
    (n*x - s)^2 > 9 * (n*sq - s^2) — so every comparison is BIGINT
    (worst case ~1e12, far inside int64) and the result hash-matches
    DuckDB bit-for-bit; a float mean/stddev would drift in the last
    ulp and flip boundary rows.

    Scale: the window partitions by user_id (high-cardinality key —
    parallelism is the user count) with a FRAME-BOUNDED spec, so
    per-task state is 11 rows regardless of a user's history length;
    one shuffle on user_id shared by the window and the final rollup.
    This is the streaming-friendly shape: the same frame runs as an
    applyInPandasWithState deque at ingest time."""
    ev = read_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-10, -1)
    )
    framed = ev.select(
        "user_id",
        "cents",
        F.count("*").over(w).cast("bigint").alias("n"),
        F.coalesce(F.sum("cents").over(w), F.lit(0)).cast("bigint").alias("s"),
        F.coalesce(F.sum(F.col("cents") * F.col("cents")).over(w), F.lit(0))
        .cast("bigint")
        .alias("sq"),
    )
    judged = F.col("n") >= 5
    anom = judged & (
        (F.col("n") * F.col("cents") - F.col("s"))
        * (F.col("n") * F.col("cents") - F.col("s"))
        > 9 * (F.col("n") * F.col("sq") - F.col("s") * F.col("s"))
    )
    return framed.groupBy("user_id").agg(
        F.count("*").cast("bigint").alias("n_events"),
        F.sum(judged.cast("int")).cast("bigint").alias("n_judged"),
        F.sum(anom.cast("int")).cast("bigint").alias("n_anomalies"),
    )


@query(
    "cusum_changepoints",
    oracle="""
    WITH c AS (
      SELECT user_id, ts, event_id,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events
    ), g AS (
      SELECT user_id, ts, event_id, cents,
             CAST(count(*)   OVER wu AS BIGINT) AS n,
             CAST(SUM(cents) OVER wu AS BIGINT) AS t
      FROM c
      WINDOW wu AS (PARTITION BY user_id)
    ), p AS (
      SELECT user_id, n, t,
             CAST(SUM(2 * n * cents - 3 * t) OVER wo AS BIGINT) AS pf,
             CAST(row_number() OVER wo AS BIGINT) AS rn
      FROM g
      WINDOW wo AS (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ), s AS (
      SELECT user_id, t, rn,
             pf - LEAST(CAST(0 AS BIGINT),
                        CAST(MIN(pf) OVER wo AS BIGINT)) AS cusum
      FROM p
      WINDOW wo AS (PARTITION BY user_id ORDER BY rn
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN cusum > 10 * t THEN 1 ELSE 0 END) AS BIGINT)
             AS n_alarms,
           CAST(MAX(cusum) AS BIGINT) AS max_cusum,
           COALESCE(MIN(CASE WHEN cusum > 10 * t THEN rn END),
                    CAST(-1 AS BIGINT)) AS first_alarm_rn
    FROM s
    GROUP BY user_id
    """,
)
def cusum_changepoints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user one-sided CUSUM changepoint detection (Page 1954) —
    the sequential upward-shift monitor production pipelines run on
    revenue/latency series. The recursion S_i = max(0, S_{i-1} + d_i)
    looks inherently serial, but it has a closed WINDOW form:
    S_i = P_i - min(0, min_{j<=i} P_j) where P is the running prefix
    sum of the drifts d — so the whole detector is two ordered
    windows (prefix sum, prefix min), no recursion, no UDF.

    Drift is measured against the user's own mean with 50% slack,
    cleared of division so every term is exact BIGINT:
    d_i = x_i - 1.5*mean scaled by 2n => d_i = 2n*x_i - 3T (T = user
    total cents, n = user count); the alarm threshold 5*mean scales
    to 10T. Alarm when S_i > 10T; reported per user: alarm count,
    peak CUSUM, and the 1-based index of the first alarm (-1 = none).

    Scale: both windows partition by user_id — parallelism is the
    user count, per-task state one running (sum, min) pair however
    long the history; one shuffle on user_id shared by the full-
    partition stats window, both ordered windows, and the rollup.
    Bounds: |P_i| <= n * (2n*x_max + 3T) — at 1e6 events/user and
    cents <= 1e5 that is ~1e17, inside int64."""
    ev = read_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    wu = W.partitionBy("user_id")
    wo = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    g = ev.select(
        "user_id", "ts", "event_id", "cents",
        F.count("*").over(wu).cast("bigint").alias("n"),
        F.sum("cents").over(wu).cast("bigint").alias("t"),
    )
    p = g.select(
        "user_id", "t",
        F.sum(2 * F.col("n") * F.col("cents") - 3 * F.col("t"))
        .over(wo).cast("bigint").alias("pf"),
        F.row_number().over(
            W.partitionBy("user_id").orderBy("ts", "event_id")
        ).cast("bigint").alias("rn"),
    )
    wr = (
        W.partitionBy("user_id")
        .orderBy("rn")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    s = p.select(
        "user_id", "t", "rn",
        (
            F.col("pf")
            - F.least(F.lit(0).cast("bigint"), F.min("pf").over(wr))
        ).alias("cusum"),
    )
    alarm = F.col("cusum") > 10 * F.col("t")
    return s.groupBy("user_id").agg(
        F.count("*").cast("bigint").alias("n_events"),
        F.sum(alarm.cast("int")).cast("bigint").alias("n_alarms"),
        F.max("cusum").cast("bigint").alias("max_cusum"),
        F.coalesce(
            F.min(F.when(alarm, F.col("rn"))), F.lit(-1).cast("bigint")
        ).alias("first_alarm_rn"),
    )


@query(
    "acf_daily_values",
    oracle="""
    WITH d AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM events
      GROUP BY event_type, CAST(ts AS DATE)
    ), l AS (
      SELECT event_type, cents,
             lag(cents, 1) OVER w AS c1,
             lag(cents, 2) OVER w AS c2,
             lag(cents, 3) OVER w AS c3
      FROM d
      WINDOW w AS (PARTITION BY event_type ORDER BY day)
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_days,
           round(corr(cents, c1), 6) AS acf1,
           round(corr(cents, c2), 6) AS acf2,
           round(corr(cents, c3), 6) AS acf3
    FROM l
    GROUP BY event_type
    """,
)
def acf_daily_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation function at lags 1-3 of each event type's
    daily-revenue series — the seasonality probe run before picking
    forecast/backfill windows (a high acf1 says yesterday predicts
    today; acf7 would catch weekly cycles). ACF at lag k is the
    sample correlation of the series with its k-day lag, so the whole
    operator is one daily rollup + one ordered window (three lag()
    columns share it) + corr() per type.

    Daily totals are exact BIGINT cents (the one lossy step, float
    summation, is removed at the source); corr itself is double but
    both engines run one-pass covariance and the 6-decimal rounding
    absorbs last-ulp noise — the same determinism contract
    stat_moments_by_flag pins.

    Scale: the rollup shuffles (type, day) partials map-side; the lag
    window partitions by event_type over the DAILY frame (bounded by
    calendar days, not events — a year is 365 rows however large the
    fact table), and the final corr is a per-type fold."""
    ev = read_table(spark, sf_dir, "events").select(
        "event_type",
        F.col("ts").cast("date").alias("day"),
        F.round(F.col("value") * 100).cast("bigint").alias("c"),
    )
    d = ev.groupBy("event_type", "day").agg(
        F.sum("c").cast("bigint").alias("cents")
    )
    w = W.partitionBy("event_type").orderBy("day")
    lagged = d.select(
        "event_type", "cents",
        F.lag("cents", 1).over(w).alias("c1"),
        F.lag("cents", 2).over(w).alias("c2"),
        F.lag("cents", 3).over(w).alias("c3"),
    )
    return lagged.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_days"),
        F.round(F.corr("cents", "c1"), 6).alias("acf1"),
        F.round(F.corr("cents", "c2"), 6).alias("acf2"),
        F.round(F.corr("cents", "c3"), 6).alias("acf3"),
    )
