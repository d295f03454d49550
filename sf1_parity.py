#!/usr/bin/env python
"""sf1 oracle parity runner: hash-exact comparison at 10x data.

Runs named queries against the scaling_check 10x replica
(FK-consistent key shifts, token-tagged docs — see scaling_check.py)
AND their DuckDB oracles on the SAME replica, through the identical
comparator the sf0.01 tests use (tests/oracle_utils.compare). This is
the per-round "does correctness hold at the next scale" sweep that
previous rounds re-scripted ad hoc; rounds 7-8 ran it over every
sf1-TRACTABLE oracle (173/205 — the others have super-linear DuckDB
shapes: pairwise self-joins, brute-force ANN re-scores, unrolled
iterative CTEs, which OOM DuckDB at sf1 while the Spark sides are the
scale path).

Usage:
    python sf1_parity.py <query> [<query> ...]   # named queries
    python sf1_parity.py --head [N]              # first N of the
                                                 # driver snapshot
                                                 # head (default 18)

CAUTION: do not point this at oracles known sf1-intractable (e.g.
trade_k_core's unrolled peeling CTE OOMed DuckDB at 100 GiB) — pick
queries whose ORACLE is linear-ish in the data.

Builds (or reuses, via the _BUILT marker) the replica at
$SPARK_GRAFT_SF1_DIR (default /tmp/lq_scaling_sf1).
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def main() -> int:
    import scaling_check as sc
    from logicash_etl_spark import get_spark
    from logicash_etl_spark.queries.streaming import clear_drains
    from oracle_utils import compare

    import __spark_entry__ as mod

    qs, osql = mod.queries(), mod.oracle_sql()
    args = sys.argv[1:]
    if args and args[0] == "--head":
        n = int(args[1]) if len(args) > 1 else 18
        names = list(qs)[:n]
    elif args:
        names = args
        unknown = [n for n in names if n not in qs]
        if unknown:
            print(f"unknown queries: {unknown}", file=sys.stderr)
            return 2
    else:
        print(__doc__, file=sys.stderr)
        return 2

    spark = get_spark(app_name="sf1-parity")
    sc.build_sf1(spark)
    sf1 = sc.BIG_DIR
    clear_drains()  # sf1 drains must be cold, full drains
    fails: list[str] = []
    for i, name in enumerate(names):
        try:
            compare(qs[name](spark, sf1), osql[name], sf1)
            print(f"{i + 1:3d}/{len(names)} OK   {name}", flush=True)
        except Exception as exc:  # noqa: BLE001
            fails.append(name)
            print(
                f"{i + 1:3d}/{len(names)} FAIL {name}: {str(exc)[:300]}",
                flush=True,
            )
        finally:
            # caller-owns-cleanup (queries package contract): at sf1
            # the persisted intermediates are 10x bigger, so a long
            # sweep would otherwise pile them up for the session
            spark.catalog.clearCache()
    print(f"sf1 parity: {len(names) - len(fails)}/{len(names)} hash-exact")
    if fails:
        print("FAILS:", fails)
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
