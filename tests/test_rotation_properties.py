"""Property tests (hypothesis) for the snapshot-head rotation in
__spark_entry__.py — the machinery that decides which 50 queries get
fresh driver confirmation each round. A quiet bug here silently costs
a round of driver signal (the round-6 lesson), so the invariants are
pinned for ANY ledger, not just the current CORRECTNESS_r*.json set:

1. changed-this-round queries come first, in list order;
2. every never-green query sorts before every green one;
3. greens are ordered by (last-confirmed round, name) ascending;
4. a red row newer than the last green un-proves the query;
5. the ordering is a permutation of the catalog (nothing dropped).
"""

from __future__ import annotations

import json
import os
import sys

from hypothesis import given, settings
from hypothesis import strategies as st

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry  # noqa: E402

_SET = settings(max_examples=30, deadline=None)

_names = st.lists(
    st.sampled_from([f"q{i:02d}" for i in range(40)]),
    min_size=1, max_size=40, unique=True,
)

# per (query, round): True = green row, False = red row
_ledger = st.dictionaries(
    st.tuples(st.sampled_from([f"q{i:02d}" for i in range(40)]),
              st.integers(min_value=1, max_value=9)),
    st.booleans(),
    max_size=120,
)


def _write_ledger(tmp_path, ledger):
    rounds: dict[int, dict] = {}
    for (name, rnd), ok in ledger.items():
        rounds.setdefault(rnd, {})[name] = {
            "rows_match": ok, "schema_match": ok, "hash_match": ok,
        }
    for rnd, rows in rounds.items():
        (tmp_path / f"CORRECTNESS_r{rnd:02d}.json").write_text(
            json.dumps(rows)
        )


def _expected_green(ledger):
    green: dict[str, int] = {}
    red: dict[str, int] = {}
    for (name, rnd), ok in ledger.items():
        bucket = green if ok else red
        bucket[name] = max(bucket.get(name, 0), rnd)
    return {n: r for n, r in green.items() if red.get(n, -1) <= r}


class _patched:
    """Explicit save/restore patching — hypothesis runs many examples
    per test call, so pytest's function-scoped monkeypatch would leak
    across examples; this context manager resets per example."""

    def __init__(self, obj, name, value):
        self.obj, self.name, self.value = obj, name, value

    def __enter__(self):
        self.saved = getattr(self.obj, self.name)
        setattr(self.obj, self.name, self.value)

    def __exit__(self, *exc):
        setattr(self.obj, self.name, self.saved)


@_SET
@given(ledger=_ledger)
def test_green_rounds_red_unproves_for_any_ledger(
    tmp_path_factory, ledger
):
    tmp_path = tmp_path_factory.mktemp("ledger")
    _write_ledger(tmp_path, ledger)
    with _patched(entry.os.path, "abspath",
                  lambda _: str(tmp_path / "x.py")):
        got = entry._green_rounds()
    assert got == _expected_green(ledger)


@_SET
@given(ledger=_ledger, catalog=_names, changed=_names)
def test_head_ordering_invariants_for_any_ledger(
    tmp_path_factory, ledger, catalog, changed
):
    tmp_path = tmp_path_factory.mktemp("ledger")
    # ledger rows only for catalog names (others are noise the parser
    # may legitimately carry; ordering only consumes catalog names)
    _write_ledger(tmp_path, ledger)
    with _patched(entry.os.path, "abspath",
                  lambda _: str(tmp_path / "x.py")), \
         _patched(entry, "QUERIES",
                  {n: (lambda s, d: None) for n in catalog}), \
         _patched(entry, "_CHANGED_THIS_ROUND", [n for n in changed]):
        names = list(entry.queries())
        green = entry._green_rounds()

    # 5. permutation of the catalog
    assert sorted(names) == sorted(catalog)

    chd = [n for n in changed if n in set(catalog)]
    # 1. changed first, in list order
    assert names[: len(chd)] == chd
    # 2. never-green before green (outside the changed prefix)
    rest = names[len(chd):]
    kinds = ["new" if n not in green else "green" for n in rest]
    assert kinds == sorted(kinds, key=lambda k: k != "new")
    # 3. greens ascending by (round, name)
    greens = [n for n in rest if n in green]
    assert greens == sorted(greens, key=lambda n: (green[n], n))
