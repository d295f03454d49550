"""Property-based tests (hypothesis) for the round-9 fourth-sweep
operators: invariants that must hold for ANY input, not just the
fixtures — HRW assignments match an independent reference and
conserve mass, linear attribution conserves money exactly, the
t-closeness EMD stays inside [0, 1e6] ppm, and ABC classes partition
the part population and its revenue."""

from __future__ import annotations

import datetime as dt
import hashlib
from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SET = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _hrw_ref(key: str, n_shards: int) -> int:
    best = -1
    for s in range(n_shards):
        h = hashlib.md5(f"{key}:{s}:".encode()).hexdigest()
        best = max(best, int(h[:14], 16) * 16 + s)
    return best % 16


@_SET
@given(ids=st.lists(st.integers(min_value=0, max_value=10**12),
                    min_size=1, max_size=40, unique=True))
def test_hrw_matches_reference_and_conserves(spark, tmp_path_factory, ids):
    from logicash_etl_spark.queries import QUERIES
    from logicash_etl_spark.schemas import DOCUMENTS

    d = str(tmp_path_factory.mktemp("hrw"))
    rows = [(i, "x", "en", "s", 1) for i in ids]
    spark.createDataFrame(rows, DOCUMENTS).write.mode("overwrite").parquet(
        f"{d}/documents.parquet"
    )
    out = QUERIES["rendezvous_shard_balance"](spark, d).collect()
    exp8 = Counter(_hrw_ref(str(i), 8) for i in ids)
    exp9 = Counter(_hrw_ref(str(i), 9) for i in ids)
    assert sum(r.n_docs_8 for r in out) == len(ids)
    assert sum(r.n_docs_9 for r in out) == len(ids)
    for r in out:
        assert r.n_docs_8 == exp8.get(r.shard, 0)
        assert r.n_docs_9 == exp9.get(r.shard, 0)
        if r.shard < 8:
            assert r.moved_in == 0


@_SET
@given(
    data=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=3),          # user
            st.integers(min_value=0, max_value=20 * 24),     # hours offset
            st.sampled_from(["view", "click", "purchase"]),
            st.integers(min_value=0, max_value=10**4),       # cents
        ),
        min_size=1,
        max_size=25,
    )
)
def test_attribution_conserves_money_exactly(spark, tmp_path_factory, data):
    """sum(linear_microcents) == 1e6 * cents of ATTRIBUTED conversions
    and sum(last_touch_cents) == those same cents — for any event
    soup, computed against an independent Python reference."""
    from logicash_etl_spark.queries import QUERIES
    from logicash_etl_spark.schemas import EVENTS

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (i + 1, t0 + dt.timedelta(hours=h), u, typ, c / 100.0, "{}")
        for i, (u, h, typ, c) in enumerate(data)
    ]
    d = str(tmp_path_factory.mktemp("attr"))
    spark.createDataFrame(rows, EVENTS).write.mode("overwrite").parquet(
        f"{d}/events.parquet"
    )
    # Python reference: attributed cents = conversions with >=1 touch
    # by the same user strictly before, within 7 days
    attributed = 0
    for eid, ts, u, typ, v, _ in rows:
        if typ != "purchase":
            continue
        lo = ts - dt.timedelta(days=7)
        if any(
            t2 < ts and t2 >= lo and u2 == u and ty2 != "purchase"
            for _, t2, u2, ty2, _, _ in rows
        ):
            attributed += round(v * 100)
    out = QUERIES["multi_touch_attribution"](spark, d).collect()
    assert sum(r.linear_microcents for r in out) == 1_000_000 * attributed
    assert sum(r.last_touch_cents for r in out) == attributed


@_SET
@given(
    custs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=24),          # nation
            st.sampled_from(["AUTO", "BUILDING", "MACHINERY"]),
            st.integers(min_value=-99999, max_value=999999),  # acctbal c
        ),
        min_size=1,
        max_size=40,
    )
)
def test_t_closeness_emd_bounds(spark, tmp_path_factory, custs):
    """For ANY population: 0 <= emd_ppm <= 1e6 (EMD of probability
    distributions over the same support), and exposure masses never
    exceed the class population."""
    from logicash_etl_spark.queries import QUERIES
    from logicash_etl_spark.schemas import CUSTOMER

    rows = [
        (i + 1, f"c{i}", n, b / 100.0, seg)
        for i, (n, seg, b) in enumerate(custs)
    ]
    d = str(tmp_path_factory.mktemp("tc"))
    spark.createDataFrame(rows, CUSTOMER).write.mode("overwrite").parquet(
        f"{d}/customer.parquet"
    )
    r = QUERIES["t_closeness_report"](spark, d).collect()[0]
    assert 0 <= r.max_emd_ppm <= 1_000_000
    assert 0 <= r.classes_above_t <= r.n_classes
    assert 0 <= r.records_above_t <= len(rows)


@_SET
@given(
    parts=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=500),     # partkey
            st.integers(min_value=1, max_value=10**6),   # cents
        ),
        min_size=1,
        max_size=40,
        unique_by=lambda t: t[0],
    )
)
def test_abc_classes_partition_parts_and_revenue(spark, tmp_path_factory, parts):
    """Classes partition the population exactly: part counts and
    revenue cents sum to the totals, the top part is ALWAYS class A
    (exclusive-prefix rule), and half-up basis-point shares sum to
    10000 +- 2 (one rounding per class)."""
    from logicash_etl_spark.queries import QUERIES
    from logicash_etl_spark.schemas import LINEITEM

    t = dt.datetime(2024, 1, 1)
    rows = [
        (k, k, 1, 1, 1.0, c / 100.0, 0.0, 0.0, "N", "O", t)
        for k, c in parts
    ]
    d = str(tmp_path_factory.mktemp("abc"))
    spark.createDataFrame(rows, LINEITEM).write.mode("overwrite").parquet(
        f"{d}/lineitem.parquet"
    )
    out = QUERIES["abc_inventory_classes"](spark, d).collect()
    assert sum(r.n_parts for r in out) == len(parts)
    assert sum(r.revenue_cents for r in out) == sum(c for _, c in parts)
    assert any(r.abc_class == "A" for r in out)
    assert abs(sum(r.revenue_share_bp for r in out) - 10000) <= 2
