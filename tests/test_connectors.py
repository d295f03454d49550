"""JDBC connector round-trip — a REAL in-process database.

Spark ships Derby on its classpath (for the Hive metastore), so the
JDBC path can be exercised end-to-end without any network or jar
fetch: embedded Derby via ``jdbc:derby:<dir>;create=true``. This
proves the partitioned-read code path (partitionColumn/bounds ->
numPartitions concurrent range queries), the write path, and filter
pushdown into the remote scan — not just the option call-shapes.

Kafka remains probe-only (no broker in the image); its call shape is
covered by ConnectorUnavailable behavior here.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from logicash_etl_spark.plans.inspect import plan_string
from logicash_etl_spark.sources.connectors import (
    ConnectorUnavailable,
    read_jdbc,
    write_jdbc,
)

DERBY = "org.apache.derby.jdbc.EmbeddedDriver"


@pytest.fixture(scope="module")
def derby_url(tmp_path_factory):
    return f"jdbc:derby:{tmp_path_factory.mktemp('derby')}/db;create=true"


def test_jdbc_partitioned_roundtrip(spark, derby_url):
    df = spark.range(0, 1000).select("id", (F.col("id") * 2).alias("v"))
    write_jdbc(df, derby_url, "T", mode="overwrite", driver=DERBY)

    back = read_jdbc(
        spark,
        derby_url,
        "T",
        partition_column="id",
        num_partitions=4,
        bounds=(0, 999),
        driver=DERBY,
    )
    # the partitioned form really issues numPartitions range queries
    assert back.rdd.getNumPartitions() == 4
    assert back.count() == 1000
    assert back.agg(F.sum("v")).collect()[0][0] == 2 * sum(range(1000))


def test_jdbc_filter_pushdown(spark, derby_url):
    back = read_jdbc(
        spark,
        derby_url,
        "T",
        partition_column="id",
        num_partitions=4,
        bounds=(0, 999),
        driver=DERBY,
    )
    filtered = back.filter(F.col("id") < 10)
    plan = plan_string(filtered)
    assert "PushedFilters" in plan
    assert "lessthan(id,10)" in plan.replace('"', "").lower()
    assert filtered.count() == 10


def test_jdbc_append_mode(spark, derby_url):
    extra = spark.range(1000, 1100).select("id", (F.col("id") * 2).alias("v"))
    write_jdbc(extra, derby_url, "T", mode="append", driver=DERBY)
    back = read_jdbc(spark, derby_url, "T", driver=DERBY)
    assert back.count() == 1100


def test_jdbc_partitioned_requires_bounds(spark, derby_url):
    with pytest.raises(ValueError, match="bounds"):
        read_jdbc(spark, derby_url, "T", partition_column="id", driver=DERBY)


def test_jdbc_missing_driver_is_clear(spark):
    with pytest.raises(ConnectorUnavailable, match="nosuchdb"):
        read_jdbc(spark, "jdbc:nosuchdb://nowhere/x", "T")
