"""Mergeable-aggregate surface — the two patterns that make 100 TB
aggregation tractable:

1. **Mergeable sketches** (`hll_partial_merge_counts`): per-group HLL
   sketches built independently (per partition / per day / per
   source) and UNIONED into exact-shaped global answers without
   re-reading the data. The oracle trick from `approx_sketches`:
   the query emits bound-check booleans (estimate within a tolerance
   of the exact value computed in the same pass), so DuckDB — which
   has no DataSketches — still hash-checks the result exactly.

2. **Re-aggregation from partials** (`weekly_rollup_from_daily`):
   daily partial (sum, count, min, max) rows merged into weekly
   answers — sum-of-sums, min-of-mins — with avg reconstructed as
   merged-sum / merged-count. The incremental-rollup contract: the
   merged result must EQUAL the direct aggregate, which is exactly
   what the oracle computes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from logicash_etl_spark.queries.registry import query
from logicash_etl_spark.sources.readers import read_table


@query(
    "hll_partial_merge_counts",
    oracle="""
    WITH per AS (
      SELECT source,
             CAST(count(DISTINCT md5(text)) AS BIGINT) AS exact_distinct
      FROM documents GROUP BY source
    )
    SELECT source, exact_distinct, TRUE AS estimate_ok FROM per
    UNION ALL
    SELECT '__ALL__' AS source,
           (SELECT CAST(count(DISTINCT md5(text)) AS BIGINT) FROM documents)
             AS exact_distinct,
           TRUE AS estimate_ok
    """,
)
def hll_partial_merge_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial-sketch merge: build one HLL sketch per source, then
    union the PARTIAL SKETCHES (hll_union_agg — never the raw rows)
    into the corpus-wide distinct count. This is the pattern that
    collapses a 100 TB count-distinct into kilobytes of mergeable
    state per partition: sketches are built map-side, merged in a
    #sources-row reduce, and the global row costs one more merge of
    the same partials. `estimate_ok` pins estimate-vs-exact within
    5% in-query (HLL lgConfigK=12 rsd ~1.6%), so the driver's hash
    check covers the sketch path without a DuckDB sketch twin."""
    docs = read_table(spark, sf_dir, "documents").select(
        "source", F.md5("text").alias("fp")
    )
    per = docs.groupBy("source").agg(
        F.hll_sketch_agg("fp").alias("sk"),
        F.countDistinct("fp").alias("exact_distinct"),
    )
    per_rows = per.select(
        "source",
        "exact_distinct",
        (
            F.abs(F.hll_sketch_estimate("sk") - F.col("exact_distinct"))
            <= 0.05 * F.col("exact_distinct")
        ).alias("estimate_ok"),
    )
    merged = per.agg(
        F.hll_union_agg("sk").alias("sk"),
        F.sum("exact_distinct").alias("__sum_parts"),
    )
    # exact global distinct: fingerprints may repeat ACROSS sources,
    # so the check needs the true corpus-wide count, not the sum
    global_exact = docs.agg(F.countDistinct("fp").alias("exact_distinct"))
    all_row = merged.crossJoin(F.broadcast(global_exact)).select(
        F.lit("__ALL__").alias("source"),
        "exact_distinct",
        (
            F.abs(F.hll_sketch_estimate("sk") - F.col("exact_distinct"))
            <= 0.05 * F.col("exact_distinct")
        ).alias("estimate_ok"),
    )
    return per_rows.unionAll(all_row)


@query(
    "weekly_rollup_from_daily",
    oracle="""
    SELECT CAST(date_trunc('week', ts) AS DATE) AS week,
           event_type,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
           CAST(count(*) AS BIGINT) AS n_events,
           min(value) AS min_value,
           max(value) AS max_value,
           round(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
                 / count(*), 6) AS avg_value
    FROM events
    GROUP BY week, event_type
    """,
)
def weekly_rollup_from_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-rollup merge: DAILY partials (decimal sum, count,
    min, max per (day, event_type)) re-aggregated into WEEKLY rows —
    sum-of-sums, sum-of-counts, min-of-mins, max-of-maxs, and avg
    reconstructed from merged sum/count. The oracle aggregates the
    raw events directly, so the hash check proves merge(partials) ==
    direct — the invariant that lets a 100 TB pipeline maintain
    rollups by touching only each day's slice once (the hypertable /
    materialized-rollup pattern). Decimal partial sums make the merge
    order-independent; a float sum would not survive the regrouping."""
    ev = read_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.to_date("ts").alias("day"), "event_type"
    ).agg(
        F.sum(F.col("value").cast("decimal(18,2)")).alias("p_sum"),
        F.count("*").alias("p_cnt"),
        F.min("value").alias("p_min"),
        F.max("value").alias("p_max"),
    )
    return (
        daily.groupBy(
            F.date_trunc("week", "day").cast("date").alias("week"), "event_type"
        )
        .agg(
            F.sum("p_sum").cast("double").alias("total_value"),
            F.sum("p_cnt").alias("n_events"),
            F.min("p_min").alias("min_value"),
            F.max("p_max").alias("max_value"),
            F.round(
                F.sum("p_sum").cast("double") / F.sum("p_cnt"), 6
            ).alias("avg_value"),
        )
    )


# Fixed-bin histogram sketch: 32 bins over [0, 512). The bin width is
# a power of two, so (value - 0) / 16.0 is EXACT in IEEE doubles and
# floor() of it is bit-identical between Spark and DuckDB — bucket
# assignment cannot drift at bin edges.
_QS_BINS = 32
_QS_LO = 0.0
_QS_W = 16.0


@query(
    "quantile_sketch_merge",
    oracle="""
    WITH h AS (
      SELECT CAST(least(greatest(floor((value - 0.0) / 16.0), 0), 31)
                  AS BIGINT) AS bucket,
             CAST(count(*) AS BIGINT) AS n
      FROM events WHERE value IS NOT NULL
      GROUP BY bucket
    ), c AS (
      SELECT bucket, n,
             CAST(SUM(n) OVER (ORDER BY bucket
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cum_n,
             CAST(SUM(n) OVER () AS BIGINT) AS total
      FROM h
    )
    SELECT bucket, n, cum_n,
           (cum_n - n < 0.5 * total AND 0.5 * total <= cum_n)
             AS contains_p50
    FROM c
    """,
)
def quantile_sketch_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable quantile sketch: per-event_type equi-width histogram
    PARTIALS (32 fixed bins) merged by plain vector addition into the
    global histogram, then cumulated into a quantile-lookup structure
    (``contains_p50`` marks the bin holding the median). The oracle
    computes the histogram DIRECTLY from the raw rows, so the hash
    check proves merge(partials) == direct — the invariant that lets
    a 100 TB pipeline keep per-partition / per-day histogram partials
    (32 longs each, kilobytes) and answer any quantile by one merge,
    never re-reading data. Same mergeable-state shape Spark uses
    inside percentile_approx; fixed power-of-two bins make the bucket
    function bit-identical across engines. The global cumsum window
    runs over <=32 rows — a driver-scale frame, not a data-scale
    one."""
    ev = read_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    bucket = F.least(
        F.greatest(F.floor((F.col("value") - _QS_LO) / _QS_W), F.lit(0)),
        F.lit(_QS_BINS - 1),
    ).alias("bucket")
    # stage 1: mergeable partials, one histogram per event_type
    partials = ev.select("event_type", bucket).groupBy(
        "event_type", "bucket"
    ).agg(F.count("*").alias("pn"))
    # stage 2: merge partials (vector add) into the global histogram
    merged = partials.groupBy("bucket").agg(F.sum("pn").alias("n"))
    w_cum = W.orderBy("bucket").rowsBetween(W.unboundedPreceding, W.currentRow)
    w_all = W.partitionBy()
    return merged.select(
        "bucket",
        "n",
        F.sum("n").over(w_cum).alias("cum_n"),
        F.sum("n").over(w_all).alias("total"),
    ).select(
        "bucket",
        "n",
        "cum_n",
        (
            (F.col("cum_n") - F.col("n") < 0.5 * F.col("total"))
            & (0.5 * F.col("total") <= F.col("cum_n"))
        ).alias("contains_p50"),
    )


@query(
    "cms_heavy_hitters",
    oracle=r"""
    WITH tok AS (
      SELECT source,
             unnest(list_filter(string_split_regex(trim(lower(text)), '\s+'),
                                x -> x <> '')) AS word
      FROM documents
    ), wc_src AS (
      SELECT source, word, CAST(count(*) AS BIGINT) AS n
      FROM tok GROUP BY source, word
    ), h_src AS (
      SELECT source, word, n, i,
             CAST(('0x' || substr(md5('cms' || CAST(i AS VARCHAR) || word),
                                  1, 8)) AS BIGINT) % 512 AS bucket
      FROM wc_src, (VALUES (0), (1), (2)) t(i)
    ), cms_partial AS (
      SELECT source, i, bucket, CAST(SUM(n) AS BIGINT) AS c
      FROM h_src GROUP BY source, i, bucket
    ), cms AS (
      SELECT i, bucket, CAST(SUM(c) AS BIGINT) AS c
      FROM cms_partial GROUP BY i, bucket
    ), wc AS (
      SELECT word, CAST(SUM(n) AS BIGINT) AS n FROM wc_src GROUP BY word
    ), top AS (
      SELECT word, n FROM wc ORDER BY n DESC, word LIMIT 20
    ), th AS (
      SELECT t.word, t.n, i,
             CAST(('0x' || substr(md5('cms' || CAST(i AS VARCHAR) || t.word),
                                  1, 8)) AS BIGINT) % 512 AS bucket
      FROM top t, (VALUES (0), (1), (2)) t2(i)
    )
    SELECT th.word, th.n, CAST(MIN(c.c) AS BIGINT) AS est,
           CAST(MIN(c.c) - th.n AS BIGINT) AS overcount
    FROM th JOIN cms c ON c.i = th.i AND c.bucket = th.bucket
    GROUP BY th.word, th.n
    """,
)
def cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch heavy hitters, built MERGEABLY: per-source CMS
    partials (3 hash rows x 512 buckets of longs — a few KB each)
    merged by plain vector addition into the corpus sketch, then the
    top-20 words' estimates read off it (est = min over rows of the
    word's bucket counter). CMS admits only overcounting, and because
    the md5 double-hash construction is engine-portable the estimate
    — and therefore ``overcount`` — is DETERMINISTIC: the DuckDB
    oracle rebuilds the identical sketch and the driver hash-pins the
    sketch path exactly, not just within bounds. At 100 TB this is
    the frequency analog of the HLL merge above: per-partition
    sketches are map-side state of constant size, merged in one
    reduce of #sources x 1536 rows; the raw token stream is touched
    once (word counts partial-aggregate before sketching, so the
    sketch build shuffles |vocab| rows, never |tokens|)."""
    from logicash_etl_spark.operators.text import tokens

    d_rows, w_buckets = 3, 512
    docs = read_table(spark, sf_dir, "documents")
    wc_src = (
        docs.select(
            "source", F.explode(tokens(F.lower(F.col("text")))).alias("word")
        )
        .groupBy("source", "word")
        .agg(F.count("*").alias("n"))
    )

    def _bucketed(df: DataFrame) -> DataFrame:
        h = F.md5(
            F.concat(F.lit("cms"), F.col("i").cast("string"), F.col("word"))
        )
        return df.select(
            df["*"],
            F.explode(F.array(*[F.lit(i) for i in range(d_rows)])).alias("i"),
        ).withColumn(
            "bucket",
            F.pmod(
                F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint"),
                F.lit(w_buckets),
            ),
        )

    # stage 1: per-source partial sketches; stage 2: merge (vector add)
    cms_partial = _bucketed(wc_src).groupBy("source", "i", "bucket").agg(
        F.sum("n").alias("c")
    )
    cms = cms_partial.groupBy("i", "bucket").agg(F.sum("c").alias("c"))
    wc = wc_src.groupBy("word").agg(F.sum("n").alias("n"))
    top = wc.orderBy(F.desc("n"), F.col("word").asc()).limit(20)
    th = _bucketed(top)
    return (
        th.join(F.broadcast(cms), on=["i", "bucket"])
        .groupBy("word", "n")
        .agg(F.min("c").alias("est"))
        .select(
            "word", "n", "est", (F.col("est") - F.col("n")).alias("overcount")
        )
    )
