#!/usr/bin/env python
"""Catalog-wide fact-scan audit: how many times does each query's
physical plan read the same fact table?

Catalyst re-derives multi-consumer lineage per consumer — it has no
common-subexpression materialization — so a frame that feeds N
consumers re-runs its whole upstream (including the fact scan) N
times unless something persists. Runtime exchange reuse does NOT
rescue this (verified: executed plans of the round-9 offenders showed
zero ReusedExchange nodes). This script counts "Scan parquet" nodes
per fact in each catalog query's FORMATTED plan (which renders an
InMemoryTableScan as a leaf, so persisted lineage is correctly not
double-counted) and prints every query at or above the threshold.

The round-9 sweep fixed every >=5 offender by persisting the SMALLEST
frame in the plan (see COVERAGE.md "Engine-wide scan-count audit");
re-run this after adding queries:

    python scan_audit.py [min_scans]      # default 3

Queries whose repeats are BY DESIGN (different filters over the same
fact, per-edge audits, ANN re-score passes) are expected output —
the audit is a prompt for judgment, not a lint error.
"""

from __future__ import annotations

import collections
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

FACTS = ("lineitem", "orders", "events", "documents", "embeddings")


def main() -> None:
    threshold = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    from logicash_etl_spark import get_spark
    from logicash_etl_spark.plans.inspect import scans
    from logicash_etl_spark.queries import QUERIES

    spark = get_spark(app_name="scan-audit")
    sf = "/root/testdata/sf0.01"
    flagged = 0
    skipped = 0
    for name, fn in sorted(QUERIES.items()):
        try:
            df = fn(spark, sf)
            cnt: collections.Counter = collections.Counter()
            for sc in scans(df):
                for f in FACTS:
                    if f in sc["location"]:
                        cnt[f] += 1
            over = {f: c for f, c in cnt.items() if c >= threshold}
            if over:
                flagged += 1
                print(f"{name}: {over}", flush=True)
        except Exception as exc:  # noqa: BLE001 — side-effectful queries
            skipped += 1
            print(f"# skipped {name}: {type(exc).__name__}", file=sys.stderr)
        spark.catalog.clearCache()
    print(f"# flagged {flagged} / {len(QUERIES)} queries at >={threshold} "
          f"scans of one fact ({skipped} skipped)")


if __name__ == "__main__":
    main()
