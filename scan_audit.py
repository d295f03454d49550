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
    python scan_audit.py --check          # gate against MANIFEST:
                                          # exit 1 on regressions or
                                          # stale entries

Queries whose repeats are BY DESIGN (different filters over the same
fact, per-edge audits, ANN re-score passes) are expected output —
the audit is a prompt for judgment, not a lint error.
"""

from __future__ import annotations

import collections
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# facts AND the scale-proportional dims: at TPC-H-like 100 TB,
# customer/part/supplier are fact-sized tables, so re-scanning them
# counts the same as re-scanning lineitem (nation/region stay out:
# catalog-bounded 25/5 rows at every SF).
FACTS = (
    "lineitem", "orders", "events", "documents", "embeddings",
    "customer", "part", "supplier",
)

# --check manifest: the measured-and-adjudicated state at threshold 3
# (round 10; see COVERAGE.md "Scan-audit deferred list" for per-query
# verdicts and the r11/r12 fix queue). The check fails on any query
# exceeding its manifest count (a scan-count REGRESSION) and on any
# manifest entry that no longer flags (a fix landed -> shrink the
# manifest deliberately). Keys: query -> {fact: max allowed scans}.
MANIFEST: dict[str, dict[str, int]] = {
    # The r13 sweep landed the 7 FIXABLE + 2 PARTIAL rows the r12
    # pre-adjudication queued (COVERAGE.md): persisted 2-col
    # embeddings projections in ann_lsh_topk / semantic_dedup_stats /
    # embedding_centroid_drift (the ivf/pq recipe; semantic_dedup
    # additionally persists its assigned frame), shared persisted
    # tokenized frames in tfidf_top_terms (explode_outer so the
    # source count rides along) / unigram_surprisal_score /
    # bigram_surprisal_score, the per-(half, word) count-table
    # restructure in vocab_drift_psi (4 -> 2, tokenize 2x -> 1x),
    # the persisted one-row midpoint in value_drift_psi (4 -> its
    # sequential floor 3), and the persisted fingerprint frame in
    # benchmark_contamination (3 -> 2).
    #
    # What remains is adjudicated repeat-BY-DESIGN (judge-reviewed
    # r12: the bloom pair compares pruned vs unpruned scans — the
    # extra pass IS the measurement; conversion_funnel keeps one
    # pushed-down filter per stage; referential_integrity_audit is
    # per-FK-edge; knn_label_vote's third scan is the label join;
    # value_drift_psi's 3 passes are sequentially dependent):
    "bloom_join_prune_stats": {"lineitem": 3},
    "bloom_pruned_revenue": {"lineitem": 3},
    "conversion_funnel": {"events": 3},
    "knn_label_vote": {"embeddings": 3},
    "referential_integrity_audit": {"lineitem": 3},
    "value_drift_psi": {"events": 3},
}


def main() -> None:
    check = "--check" in sys.argv[1:]
    args = [a for a in sys.argv[1:] if a != "--check"]
    threshold = int(args[0]) if args else 3
    from logicash_etl_spark import get_spark
    from logicash_etl_spark.plans.inspect import scans
    from logicash_etl_spark.queries import QUERIES

    spark = get_spark(app_name="scan-audit")
    sf = "/root/testdata/sf0.01"
    flagged: dict[str, dict[str, int]] = {}
    skipped: set[str] = set()
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
                flagged[name] = over
                print(f"{name}: {over}", flush=True)
        except Exception as exc:  # noqa: BLE001 — side-effectful queries
            skipped.add(name)
            print(f"# skipped {name}: {type(exc).__name__}", file=sys.stderr)
        spark.catalog.clearCache()
    print(f"# flagged {len(flagged)} / {len(QUERIES)} queries at "
          f">={threshold} scans of one fact ({len(skipped)} skipped)")
    if not check:
        return
    if threshold != 3:
        print("# --check manifest is calibrated at threshold 3",
              file=sys.stderr)
        raise SystemExit(2)
    regressions = {
        n: over for n, over in flagged.items()
        if any(c > MANIFEST.get(n, {}).get(f, 0) for f, c in over.items())
    }
    # a manifest query that raised during plan build is NOT a landed
    # fix — report it as its own failure class, never as stale
    broken = sorted(set(MANIFEST) & skipped)
    stale = sorted(set(MANIFEST) - set(flagged) - skipped)
    if regressions:
        print(f"# SCAN REGRESSIONS vs manifest: {regressions}")
    if broken:
        print(f"# manifest entries that RAISED at plan build "
              f"(fix the query, then re-audit): {broken}")
    if stale:
        print(f"# stale manifest entries (fix landed — remove): {stale}")
    raise SystemExit(1 if (regressions or stale or broken) else 0)


if __name__ == "__main__":
    main()
