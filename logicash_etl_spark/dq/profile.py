"""Data profiling — Spark-native version of the generator's pandas QA
report (data_gen/generator.py:210-270) and the QA scripts' audits
(qa/validate_data.py:127-148, qa/validate_data_fast.py:156-171).

Everything is a single aggregation pass per call; distinct counts use
``approx_count_distinct`` by default (HLL sketch, mergeable, no
shuffle explosion at 100 TB) with ``exact=True`` opt-in.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)


def null_audit(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """COUNT(*) vs COUNT(col) per column, one pass (A4)."""
    cols = cols or df.columns
    aggs = [F.count("*").alias("total_rows")]
    for c in cols:
        aggs.append(F.count(F.col(c)).alias(f"{c}_non_null"))
        aggs.append(F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"{c}_nulls"))
    return df.agg(*aggs)


def profile(df: DataFrame, exact_distinct: bool = False) -> DataFrame:
    """One-pass multi-metric profile (A7/A10): per numeric column
    min/max/avg/median(approx), per column distinct count + nulls.

    Returns a single-row DataFrame; callers `.collect()[0]` it (it is
    an aggregate, so collecting is O(columns), not O(rows)).
    """
    aggs = [F.count("*").alias("total_rows")]
    distinct = (
        (lambda c: F.countDistinct(F.col(c)))
        if exact_distinct
        else (lambda c: F.approx_count_distinct(F.col(c)))
    )
    for field in df.schema.fields:
        c = field.name
        aggs.append(distinct(c).alias(f"{c}_distinct"))
        aggs.append(F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"{c}_nulls"))
        if isinstance(field.dataType, _NUMERIC):
            aggs.append(F.min(c).alias(f"{c}_min"))
            aggs.append(F.max(c).alias(f"{c}_max"))
            aggs.append(F.avg(c).alias(f"{c}_avg"))
            aggs.append(F.percentile_approx(c, 0.5).alias(f"{c}_median"))
    return df.agg(*aggs)


def percentiles(
    col,
    fractions,
    exact: bool = False,
    accuracy: int = 10_000,
) -> Column:
    """Percentile aggregate expression — THE sanctioned switch between
    the scale-safe sketch and the exact aggregate.

    Default (``exact=False``): ``percentile_approx`` — a KLL-style
    quantile digest with rank error 1/accuracy. Mergeable, bounded
    memory per partition, combines map-side: the 100 TB path, and why
    it is the default rather than a docstring promise.

    ``exact=True``: true interpolated percentiles. The aggregation
    buffer holds EVERY value of the column, so a single global agg
    becomes the query's scale ceiling — reserve it for oracle
    verification (hash-exact parity needs deterministic interpolated
    values) and provably bounded frames. Grep for ``exact=True`` call
    sites to audit every exact-percentile use in the repo; raw
    ``F.percentile`` should not appear outside this function.
    """
    fr = fractions if isinstance(fractions, Column) else F.lit(fractions)
    if exact:
        return F.percentile(col, fr)
    return F.percentile_approx(col, fr, F.lit(accuracy))


def selectivity_report(
    df: DataFrame,
    col: str,
    thresholds: list[float],
    buckets: int = 32,
    exact: bool = False,
    accuracy: int = 10_000,
    quantize_scale: int = 100,
) -> DataFrame:
    """Equi-depth histogram statistics + CBO-style selectivity
    estimation (the estimator behind cost-based join ordering and
    scan-pruning decisions), as a measurable report: build the
    ``buckets``-bucket equi-depth histogram an ANALYZE TABLE would
    store for ``df.col``, evaluate each ``v <= threshold`` predicate
    under the uniform-within-bucket assumption, and emit estimated
    rows vs exact rows vs relative error per threshold.

    Scale (100 TB posture): ONE scan computes the bucket bounds, the
    total, and every exact predicate count in a single aggregate;
    estimation is arithmetic over the (buckets+1)-element bounds array
    on a single row, exploded to one row per threshold. No joins, no
    second scan, no driver-side math. Bounds default to the
    ``percentile_approx`` sketch (see :func:`percentiles` — mergeable,
    bounded memory); ``exact=True`` opts into true interpolated
    percentiles for oracle-checkable determinism.

    Determinism (the exact path): bounds quantize to integer units via
    ``floor(x*quantize_scale + 0.5)`` — pure double arithmetic
    identical across engines (native ``round(double, n)`` diverges at
    .xx5) — so an interpolation ulp cannot leak; per-bucket overlap
    fractions divide exact integer differences; the per-bucket sum is
    an order-pinned left fold; outputs round only at the edge.

    Every ``threshold * quantize_scale`` must be an integer (the
    predicate is evaluated in quantized units exactly).
    """
    v = F.col(col)
    fractions = [i / buckets for i in range(buckets + 1)]
    xs = []
    for x in thresholds:
        xc = x * quantize_scale
        if xc != int(xc):
            raise ValueError(
                f"threshold {x} is not an integer multiple of "
                f"1/{quantize_scale}; pick a finer quantize_scale"
            )
        xs.append(int(xc))
    s = df.agg(
        percentiles(col, fractions, exact=exact, accuracy=accuracy).alias(
            "q"
        ),
        F.count("*").alias("total"),
        *[
            F.sum((v <= t).cast("int")).alias(f"__a{i}")
            for i, t in enumerate(thresholds)
        ],
    )
    b = s.select(
        F.transform(
            "q",
            lambda x: F.floor(x * quantize_scale + 0.5).cast("bigint"),
        ).alias("bounds"),
        "total",
        *[f"__a{i}" for i in range(len(thresholds))],
    )
    t = b.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(xc).cast("bigint").alias("xc"),
                        F.col(f"__a{i}").cast("bigint").alias("actual"),
                    )
                    for i, xc in enumerate(xs)
                ]
            )
        ).alias("p"),
        "bounds",
        "total",
    )
    lo = lambda i: F.element_at(F.col("bounds"), i)  # noqa: E731
    hi = lambda i: F.element_at(F.col("bounds"), i + 1)  # noqa: E731
    x = F.col("p.xc")
    one, zero = F.lit(1).cast("double"), F.lit(0).cast("double")
    overlap = lambda acc, i: acc + (  # noqa: E731
        F.when(
            hi(i) <= lo(i),
            F.when(x >= hi(i), one).otherwise(zero),
        ).otherwise(
            F.least(
                one,
                F.greatest(
                    zero,
                    (x - lo(i)).cast("double")
                    / (hi(i) - lo(i)).cast("double"),
                ),
            )
        )
    )
    raw_est = (
        F.col("total").cast("double")
        / buckets
        * F.aggregate(
            F.sequence(F.lit(1), F.lit(buckets)), F.lit(0.0), overlap
        )
    )
    return t.select(
        (x.cast("double") / quantize_scale).alias("threshold"),
        F.col("p.actual").alias("actual_rows"),
        raw_est.alias("__raw"),
    ).select(
        "threshold",
        "actual_rows",
        F.round("__raw", 4).alias("est_rows"),
        F.round(
            100 * (F.col("__raw") - F.col("actual_rows"))
            / F.col("actual_rows"),
            2,
        ).alias("rel_err_pct"),
    )


def value_counts(df: DataFrame, col: str, top: int = 20) -> DataFrame:
    """pandas value_counts analog: groupBy + count + top-k."""
    return (
        df.groupBy(col)
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.col(col).asc())
        .limit(top)
    )


def range_audit(df: DataFrame, col: str) -> DataFrame:
    """Range audit (validate_data.py:139-148): min/max/avg plus the
    'must be zero after cleaning' non-positive count, one pass."""
    return df.agg(
        F.count("*").alias("total_rows"),
        F.min(col).alias(f"{col}_min"),
        F.max(col).alias(f"{col}_max"),
        F.avg(col).alias(f"{col}_avg"),
        F.sum(F.when(F.col(col) <= 0, 1).otherwise(0)).alias(f"{col}_non_positive"),
    )
