"""Structured Streaming surface: file-trigger ingestion + windowed ops."""

from logicash_etl_spark.streaming.sources import stream_parquet_dir, run_available_now
from logicash_etl_spark.streaming.ops import (
    windowed_counts,
    session_windows,
    dedup_stream,
)

__all__ = [
    "stream_parquet_dir",
    "run_available_now",
    "windowed_counts",
    "session_windows",
    "dedup_stream",
]
