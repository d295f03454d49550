#!/usr/bin/env python
"""Driver-posture check: run the CORRECTNESS snapshot head on a
VANILLA SparkSession — local[4], 2g driver, zero engine conf — and
compare each query against its DuckDB oracle with the driver-identical
comparator (tests/oracle_utils.compare) at sf0.01.

Why this exists: the engine's own `get_spark()` sets AQE/shuffle/
timezone conf, but the DRIVER builds its own session and owes us
nothing beyond defaults. A query whose hash-exactness silently depends
on our conf (shuffle partition count leaking into a sample, a
session-timezone-dependent cast) passes every local suite and then
goes red in the driver round. Rounds 8-9 ran this check ad hoc three
times per session; this commits it as a one-command tool.

Usage:
    python vanilla_head_check.py [N]        # first N head rows (default 50)
    python vanilla_head_check.py q1 q2 ...  # named queries

The snapshot head ordering comes from __spark_entry__.queries() — the
exact rows the driver will read this round.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def vanilla_spark():
    """A conf-less session shaped like the driver's: small, default
    AQE/shuffle/timezone, no engine tuning. local[4] keeps the check
    honest about parallelism-dependent results without the 32-thread
    bench footprint."""
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master("local[4]")
        .appName("vanilla-head-check")
        .config("spark.driver.memory", "2g")
        .getOrCreate()
    )


def main() -> int:
    import __spark_entry__ as entry
    from oracle_utils import compare

    sf_dir = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.01")
    qs, oracles = entry.queries(), entry.oracle_sql()
    args = sys.argv[1:]
    if args and not args[0].isdigit():
        names = args
        missing = [n for n in names if n not in qs]
        if missing:
            print(f"not in catalog: {missing}", file=sys.stderr)
            return 2
    else:
        n = int(args[0]) if args else 50
        names = list(qs)[:n]

    spark = vanilla_spark()
    failed = []
    for i, name in enumerate(names, 1):
        try:
            df = qs[name](spark, sf_dir)
            if name in oracles:
                compare(df, oracles[name], sf_dir)
                print(f"  {i}/{len(names)} OK   {name}", flush=True)
            else:
                assert df.count() >= 0 and df.columns
                print(f"  {i}/{len(names)} ROWS {name}", flush=True)
        except Exception as exc:  # noqa: BLE001 — report, keep sweeping
            failed.append(name)
            print(f"  {i}/{len(names)} FAIL {name}: {exc}", flush=True)
        finally:
            spark.catalog.clearCache()
    print(
        f"vanilla head check: {len(names) - len(failed)}/{len(names)} OK"
        + (f"; FAILED: {failed}" if failed else "")
    )
    spark.stop()
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
