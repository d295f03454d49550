"""Driver-contract invariants for __spark_entry__.py — pure-Python
(no SparkSession): the rotation arithmetic that decides which queries
land in the driver's 50-row CORRECTNESS snapshot. A broken invariant
here silently costs a round of driver signal (round-6 lesson: 62
changed queries against a 50-row window left 14 waiting)."""

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


def test_rotation_lists_are_registered_names():
    qs = entry.queries()
    for lst in (entry._CHECK_FIRST, entry._CHANGED_R7):
        missing = [n for n in lst if n not in qs]
        assert not missing, f"rotation list names not in catalog: {missing}"
    stale = [n for n in entry._DRIVER_GREEN if n not in qs]
    assert not stale, f"_DRIVER_GREEN names not in catalog: {stale}"


def test_snapshot_head_covers_unchecked_and_changed():
    """Every query without a driver-green row, and every query changed
    this round, must sit inside the first SNAPSHOT_ROWS entries — the
    only rows the driver's correctness pass reads."""
    names = list(entry.queries())
    head = set(names[:SNAPSHOT_ROWS])
    nongreen = [n for n in names if n not in entry._DRIVER_GREEN]
    outside = [n for n in nongreen if n not in head]
    assert not outside, f"never-driver-checked queries outside head: {outside}"
    changed_outside = [n for n in entry._CHANGED_R7 if n not in head]
    assert not changed_outside, (
        f"changed-this-round queries outside head: {changed_outside}"
    )
    # and the never-checked ones come FIRST (before re-confirmations)
    k = len([n for n in entry._CHECK_FIRST if n in set(names)])
    assert names[:k] == [n for n in entry._CHECK_FIRST if n in set(names)]


def test_green_set_matches_recorded_correctness_rows():
    """_DRIVER_GREEN must be a subset of names that actually hold a
    green row in some CORRECTNESS_r*.json — the set is a LEDGER, not
    an opinion."""
    import glob
    import json

    repo = os.path.dirname(os.path.abspath(entry.__file__))
    green_on_disk: set[str] = set()
    for path in glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")):
        rows = json.load(open(path))
        for name, r in rows.items():
            if (
                isinstance(r, dict)
                and r.get("rows_match")
                and r.get("schema_match")
                and r.get("hash_match")
            ):
                green_on_disk.add(name)
    unproven = sorted(set(entry._DRIVER_GREEN) - green_on_disk)
    assert not unproven, f"_DRIVER_GREEN without a recorded green row: {unproven}"
