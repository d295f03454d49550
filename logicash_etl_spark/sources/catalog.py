"""Catalog registration — the Glue-crawler replacement (S8).

The reference runs a crawler that infers schemas from S3 and updates a
Glue catalog (infrastructure/main.tf:155-179). In-engine the same
capability is synchronous: register every file under a root as a temp
view (or a persistent catalog table), schema from the registry when
known, else from parquet self-description / CSV inference.
"""

from __future__ import annotations

import logging
import os

from pyspark.sql import DataFrame, SparkSession

_LOG = logging.getLogger(__name__)

from logicash_etl_spark import schemas as S
from logicash_etl_spark.sources.readers import read_csv_dir, read_parquet


def register_sources(
    spark: SparkSession, root: str, persistent: bool = False
) -> dict[str, DataFrame]:
    """Discover ``<root>/<name>.parquet`` / ``<root>/<name>/`` (csv dir)
    sources and register each as view/table ``name``.

    Returns name -> DataFrame. Replaces crawler+poll (main.tf:374-408)
    with a synchronous call.
    """
    registered: dict[str, DataFrame] = {}
    for entry in sorted(os.listdir(root)):
        path = os.path.join(root, entry)
        name, ext = os.path.splitext(entry)
        try:
            if ext == ".parquet" or (
                os.path.isdir(path) and any(f.endswith(".parquet") for f in os.listdir(path))
            ):
                df = read_parquet(spark, path, S.FIXTURE_TABLES.get(name))
            elif ext == ".csv" or (
                os.path.isdir(path) and any(f.endswith(".csv") for f in os.listdir(path))
            ):
                name = name if ext else entry
                df = read_csv_dir(spark, path, schema=S.LOGICASH_TABLES.get(name), infer=True)
            else:
                continue
        except Exception as e:  # noqa: BLE001 — crawler semantics: skip unreadable
            _LOG.warning("crawler skipping unreadable %s: %s", path, e)
            continue
        if persistent:
            df.write.mode("overwrite").saveAsTable(name)
        else:
            df.createOrReplaceTempView(name)
        registered[name] = df
    return registered
