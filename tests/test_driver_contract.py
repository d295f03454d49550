"""Driver-contract invariants for __spark_entry__.py — pure-Python
(no SparkSession): the rotation arithmetic that decides which queries
land in the driver's 50-row CORRECTNESS snapshot. A broken invariant
here silently costs a round of driver signal (round-6 lesson: 62
changed queries against a 50-row window left 14 waiting).

Round-8 scheme (green-rotation aging): head = changed-this-round ∪
never-driver-checked ∪ OLDEST greens, with the green ledger parsed
from CORRECTNESS_r*.json — self-maintaining, no hand-edited list.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry  # noqa: E402

SNAPSHOT_ROWS = 50


def test_every_query_has_an_oracle():
    qs, osql = entry.queries(), entry.oracle_sql()
    assert set(qs) == set(osql), (
        "queries() and oracle_sql() must cover the same names; "
        f"diff={set(qs) ^ set(osql)}"
    )


def test_changed_list_is_registered_names():
    qs = entry.queries()
    missing = [n for n in entry._CHANGED_R8 if n not in qs]
    assert not missing, f"_CHANGED_R8 names not in catalog: {missing}"


def test_green_ledger_parses_and_covers_catalog():
    """The aging rotation only works if the ledger parses: every
    registered query must either hold a green row in some
    CORRECTNESS_r*.json or sit inside the snapshot head (where the
    next driver round records one)."""
    green = entry._green_rounds()
    assert green, "no CORRECTNESS ledger parsed — aging would degrade"
    names = list(entry.queries())
    head = set(names[:SNAPSHOT_ROWS])
    unproven_outside = [
        n for n in names if n not in green and n not in head
    ]
    assert not unproven_outside, (
        f"queries with no driver-green row outside the head: "
        f"{unproven_outside}"
    )


def test_snapshot_head_covers_changed_and_unchecked():
    """Every changed-this-round query and every query without a
    driver-green row must sit inside the first SNAPSHOT_ROWS entries —
    the only rows the driver's correctness pass reads. Changed queries
    come FIRST (a head overflow should push out re-confirmations of
    old greens, never changed work)."""
    names = list(entry.queries())
    head = set(names[:SNAPSHOT_ROWS])
    changed = [n for n in entry._CHANGED_R8 if n in set(names)]
    assert len(changed) <= SNAPSHOT_ROWS, "changed list exceeds snapshot"
    assert names[: len(changed)] == changed
    green = entry._green_rounds()
    nongreen = [n for n in names if n not in green]
    outside = [n for n in nongreen if n not in head]
    assert not outside, f"never-driver-checked queries outside head: {outside}"


def test_head_fills_with_oldest_greens():
    """GREEN-ROTATION AGING: after the changed and never-checked
    queries, the remaining head slots must hold the greens whose last
    driver confirmation is OLDEST — ascending (round, name) — so
    driver rows refresh on a rolling cadence instead of going stale."""
    green = entry._green_rounds()
    names = list(entry.queries())
    changed = [n for n in entry._CHANGED_R8 if n in set(names)]
    k = len(changed) + len([n for n in names if n not in green])
    expected_tail = sorted(
        (n for n in names[k:]), key=lambda n: (green[n], n)
    )
    assert names[k:] == expected_tail, (
        "greens not ordered oldest-confirmation-first after the head "
        "priority lists"
    )


def test_green_rounds_matches_raw_ledger():
    """_green_rounds() must agree with a direct read of the JSON files
    — green means rows AND schema AND hash all matched, latest round
    wins."""
    import glob
    import json
    import re

    repo = os.path.dirname(os.path.abspath(entry.__file__))
    expected: dict[str, int] = {}
    for path in glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        rows = json.load(open(path))
        for name, r in rows.items():
            if (
                isinstance(r, dict)
                and r.get("rows_match")
                and r.get("schema_match")
                and r.get("hash_match")
            ):
                expected[name] = max(expected.get(name, 0), int(m.group(1)))
    assert entry._green_rounds() == expected
