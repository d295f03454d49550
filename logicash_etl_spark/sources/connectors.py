"""External connectors — JDBC warehouse and Kafka stream.

The reference's warehouse leg is Redshift COPY/UNLOAD
(sql/ddl_staging.sql:40-43, ddl_gold.sql:71-89); in-engine the gold
path is Spark-native parquet/catalog, but deployments that DO front a
warehouse or a Kafka bus use these wrappers. Availability is probed at
call time and a clear error names the missing piece.

The JDBC path is exercised END-TO-END against embedded Derby (on
Spark's own classpath) in tests/test_connectors.py: partitioned
range-query reads, filter pushdown into the remote scan, and writes.
Kafka has no broker in the image, so only its call shape and failure
mode are pinned.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


class ConnectorUnavailable(RuntimeError):
    pass


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    num_partitions: int = 16,
    bounds: tuple[int, int] | None = None,
    **options: str,
) -> DataFrame:
    """Parallel JDBC read. Without ``partition_column`` the whole table
    arrives through ONE connection — never acceptable at scale, so the
    partitioned form is the default posture: numPartitions concurrent
    range-queries between lowerBound/upperBound."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if partition_column:
        if bounds is None:
            raise ValueError("partitioned JDBC read needs (lower, upper) bounds")
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", str(num_partitions))
            .option("lowerBound", str(bounds[0]))
            .option("upperBound", str(bounds[1]))
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    try:
        return reader.load()
    except Exception as exc:  # noqa: BLE001
        raise ConnectorUnavailable(
            f"JDBC driver for {url.split(':')[1] if ':' in url else url} not on the "
            "classpath (add the driver jar via spark.jars)"
        ) from exc


def write_jdbc(df: DataFrame, url: str, table: str, mode: str = "append", **options: str) -> None:
    writer = df.write.format("jdbc").option("url", url).option("dbtable", table).mode(mode)
    for k, v in options.items():
        writer = writer.option(k, v)
    try:
        writer.save()
    except Exception as exc:  # noqa: BLE001
        raise ConnectorUnavailable("JDBC driver not on the classpath") from exc


def read_kafka_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    value_schema: T.StructType | None = None,
    starting_offsets: str = "latest",
) -> DataFrame:
    """Kafka stream -> (key, value, timestamp, ...) DataFrame; with
    ``value_schema`` the JSON payload is parsed into columns. Pairs
    with streaming/ops.py (watermarks, windows, dedup)."""
    try:
        stream = (
            spark.readStream.format("kafka")
            .option("kafka.bootstrap.servers", bootstrap_servers)
            .option("subscribe", topic)
            .option("startingOffsets", starting_offsets)
            .load()
        )
    except Exception as exc:  # noqa: BLE001
        raise ConnectorUnavailable(
            "spark-sql-kafka connector not on the classpath (add "
            "org.apache.spark:spark-sql-kafka-0-10_2.13 via spark.jars.packages)"
        ) from exc
    if value_schema is not None:
        from pyspark.sql import functions as F

        return stream.select(
            F.col("timestamp"),
            F.from_json(F.col("value").cast("string"), value_schema).alias("v"),
        ).select("timestamp", "v.*")
    return stream
