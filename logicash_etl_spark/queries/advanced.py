"""Advanced surface: cube, unpivot, approximate sketches, and the
sanctioned Pandas-UDF slow path."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from logicash_etl_spark.functions.money import dsum
from logicash_etl_spark.queries.registry import query
from logicash_etl_spark.sources.readers import read_table


@query(
    "cube_order_stats",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           count(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def cube_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE: all 4 grouping-set combinations in one shuffle (Spark
    expands grouping sets map-side)."""
    return read_table(spark, sf_dir, "orders").cube("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n"), dsum("o_totalprice", "total")
    )


@query(
    "unpivot_daily_metrics",
    oracle="""
    WITH wide AS (
      SELECT CAST(o_orderdate AS DATE) AS fecha_dia,
             CAST(count(*) AS DOUBLE) AS n_orders,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
             CAST(MAX(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS max_price
      FROM orders GROUP BY fecha_dia
    )
    SELECT fecha_dia, metric, value FROM wide
    UNPIVOT (value FOR metric IN (n_orders, total, max_price))
    """,
)
def unpivot_daily_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (wide->long) via the native unpivot/melt operator."""
    wide = (
        read_table(spark, sf_dir, "orders")
        .withColumn("fecha_dia", F.to_date("o_orderdate"))
        .groupBy("fecha_dia")
        .agg(
            F.count("*").cast("double").alias("n_orders"),
            dsum("o_totalprice", "total"),
            F.max(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("max_price"),
        )
    )
    return wide.unpivot(
        "fecha_dia", ["n_orders", "total", "max_price"], "metric", "value"
    )


@query("approx_sketches")  # sketch values are engine-specific: rows-only check
def approx_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB substitutes for exact distinct/quantiles: HLL
    approx_count_distinct and percentile_approx — mergeable sketches,
    bounded memory, no giant shuffle. Accuracy vs exact is bounded in
    tests/test_extensions.py."""
    li = read_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey", rsd=0.02).alias("approx_orders"),
        F.percentile_approx("l_extendedprice", [0.5, 0.95], 10_000).alias("price_q"),
        F.count("*").alias("n"),
    )


@query(
    "embedding_norms_pandas_udf",
    oracle="""
    SELECT vec_id, round(sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                               CAST(embedding AS DOUBLE[]))), 6) AS l2_norm
    FROM embeddings
    """,
)
def embedding_norms_pandas_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sanctioned Python slow path: an Arrow-batched scalar
    pandas_udf (one serde per batch, not per row). The kernel uses the
    same left-fold accumulation as the JVM/DuckDB implementations so
    results stay bitwise-comparable; rounding guards the last ulp.

    (Norms are also expressible as pure JVM aggregate() — see
    operators/similarity.py — this query exists to pin the UDF
    machinery: Arrow transfer, null handling, schema contract.)
    """

    @F.pandas_udf("double")
    def l2(series: pd.Series) -> pd.Series:
        def norm(v):
            if v is None:
                return None
            acc = 0.0
            for x in v:  # sequential fold == JVM aggregate order
                acc += float(x) * float(x)
            return acc ** 0.5
        return series.map(norm)

    emb = read_table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id", F.round(l2(F.col("embedding").cast("array<double>")), 6).alias("l2_norm")
    )
