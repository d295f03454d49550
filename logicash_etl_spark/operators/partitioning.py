"""Partition-layout helpers.

A parquet scan's task count is bounded by file splits (row groups /
``maxPartitionBytes`` ranges). CPU-heavy operators downstream of a
narrow projection — tokenization, per-row hashing, Arrow/pandas UDF
kernels — inherit that layout, so a corpus that happens to live in few
splits runs nearly single-threaded no matter how many cores exist.

``scale_out`` repartitions ONLY when the current layout undershoots
the cluster's parallelism. On a real deployment (100 TB over many
files) scans already carry >= cores splits and this is a no-op; the
shuffle it inserts in the undershoot case moves just the narrow
projection (ids + the column being processed), one bounded pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def scale_out(df: DataFrame, target: int | None = None) -> DataFrame:
    """Round-robin repartition to ``target`` (default: cluster default
    parallelism) iff the DataFrame currently has fewer partitions.

    Call on the *narrow* projection feeding CPU-heavy per-row work,
    before any ``persist()`` (a cache pins its input layout).
    """
    sc = df.sparkSession.sparkContext
    want = target or sc.defaultParallelism
    if df.rdd.getNumPartitions() < want:
        return df.repartition(want)
    return df
