"""Shared build-once lot cache with per-lot build timing.

Query modules materialize expensive shared inputs ("lots") once per
process and reuse them across queries; bench.py pre-builds them as
named ``lot_build`` line items so consumer-query timings stay
attribution-stable. This is the one implementation of the
cache-and-time pattern those modules share (each keeps its own cache
and seconds dicts, cleared by its own ``clear_lots``).
"""

from __future__ import annotations

import time
from collections.abc import Callable, Hashable, MutableMapping


def timed_lot(
    cache: MutableMapping,
    seconds: MutableMapping[str, float],
    key: Hashable,
    name: str,
    build: Callable[[], object],
):
    """Build ``build()`` once per ``key``; record the build's seconds
    under ``name``. Re-requests cost a dict lookup and keep reporting
    the original build time."""
    if key not in cache:
        t0 = time.perf_counter()
        cache[key] = build()
        seconds[name] = round(time.perf_counter() - t0, 4)
    return cache[key]
