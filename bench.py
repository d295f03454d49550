#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": N, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Modeled on the reference's self-timing harness
(qa/validate_data_fast.py:23-180): wall-clock per phase, but per-query
and machine-readable. Each query is forced with a count() (full plan
execution, no driver-side result materialization cost).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from logicash_etl_spark import get_spark
from logicash_etl_spark.queries import QUERIES


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    spark = get_spark(app_name="logicash-bench")

    # one warmup action: JVM/codegen/parquet-footer caches
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()

    timings: dict[str, float] = {}
    t_all = time.perf_counter()
    for name in sorted(QUERIES):
        fn = QUERIES[name]
        t0 = time.perf_counter()
        try:
            fn(spark, sf_dir).count()
            timings[name] = round(time.perf_counter() - t0, 4)
        except Exception as exc:  # noqa: BLE001
            timings[name] = -1.0
            print(f"# bench error {name}: {exc}", file=sys.stderr)
        # operators may persist intermediates; isolate measurements
        spark.catalog.clearCache()
    total = round(time.perf_counter() - t_all, 4)

    print(
        json.dumps(
            {
                "metric": "total_query_wall_clock",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
