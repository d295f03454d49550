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
            st.integers(min_value=-(10**4), max_value=10**4),  # cents
        ),
        min_size=1,
        max_size=25,
    )
)
def test_attribution_conserves_money_exactly(spark, tmp_path_factory, data):
    """sum(linear_microcents) == 1e6 * CLAMPED cents of ATTRIBUTED
    conversions and sum(last_touch_cents) == those same cents — for
    any event soup INCLUDING refunds (negative value, r10 contract:
    GREATEST(cents, 0) before the split, so refunds attribute zero),
    computed against an independent Python reference."""
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
            attributed += max(round(v * 100), 0)
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


@_SET
@given(
    orders=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=8),       # cust
            st.integers(min_value=0, max_value=400),     # days before asof
            st.integers(min_value=1, max_value=10**6),   # cents
        ),
        min_size=1,
        max_size=30,
    )
)
def test_rfm_partitions_customers_and_conserves_money(
    spark, tmp_path_factory, orders
):
    """Every customer lands in exactly one segment; segment customer
    counts, order counts and monetary cents sum to the population
    totals for any order history."""
    from logicash_etl_spark.queries import QUERIES
    from logicash_etl_spark.schemas import ORDERS

    a = dt.datetime(2024, 12, 31)
    rows = [
        (i + 1, cu, "F", c / 100.0, a - dt.timedelta(days=days), "1")
        for i, (cu, days, c) in enumerate(orders)
    ]
    d = str(tmp_path_factory.mktemp("rfm"))
    spark.createDataFrame(rows, ORDERS).write.mode("overwrite").parquet(
        f"{d}/orders.parquet"
    )
    out = QUERIES["rfm_segmentation"](spark, d).collect()
    assert sum(r.n_customers for r in out) == len({cu for cu, _, _ in orders})
    assert sum(r.sum_orders for r in out) == len(orders)
    assert sum(r.total_monetary_cents for r in out) == sum(
        c for _, _, c in orders
    )


@_SET
@given(
    events=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=5),       # user
            st.integers(min_value=0, max_value=40),      # days offset
            st.sampled_from(["view", "purchase"]),
            st.integers(min_value=0, max_value=10**5),   # cents
        ),
        min_size=1,
        max_size=25,
    )
)
def test_ltv_attributes_every_purchase_cent(spark, tmp_path_factory, events):
    """Every purchase cent lands in exactly one (cohort, age) cell —
    a purchaser always has a first-seen row (their own purchase at
    the latest), so nothing can drop; cumulatives are monotone
    within each cohort."""
    from logicash_etl_spark.queries import QUERIES
    from logicash_etl_spark.schemas import EVENTS

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (i + 1, t0 + dt.timedelta(days=dd), u, typ, c / 100.0, "{}")
        for i, (u, dd, typ, c) in enumerate(events)
    ]
    d = str(tmp_path_factory.mktemp("ltv"))
    spark.createDataFrame(rows, EVENTS).write.mode("overwrite").parquet(
        f"{d}/events.parquet"
    )
    out = QUERIES["cohort_ltv_curve"](spark, d).collect()
    total_purchase_cents = sum(
        c for _, _, typ, c in events if typ == "purchase"
    )
    assert sum(r.revenue_cents for r in out) == total_purchase_cents
    by_cohort: dict = {}
    for r in sorted(out, key=lambda r: (str(r.cohort_week), r.age_week)):
        prev = by_cohort.get(r.cohort_week, 0)
        assert r.cum_revenue_cents == prev + r.revenue_cents
        by_cohort[r.cohort_week] = r.cum_revenue_cents


@_SET
@given(
    events=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=6),       # user
            st.integers(min_value=0, max_value=10**4),   # minutes offset
            st.sampled_from(["view", "purchase"]),
        ),
        min_size=1,
        max_size=20,
    )
)
def test_time_to_convert_percentiles_are_ordered(
    spark, tmp_path_factory, events
):
    from logicash_etl_spark.queries import QUERIES
    from logicash_etl_spark.schemas import EVENTS

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (i + 1, t0 + dt.timedelta(minutes=m), u, typ, 0.0, "{}")
        for i, (u, m, typ) in enumerate(events)
    ]
    d = str(tmp_path_factory.mktemp("ttc"))
    spark.createDataFrame(rows, EVENTS).write.mode("overwrite").parquet(
        f"{d}/events.parquet"
    )
    r = QUERIES["time_to_convert_percentiles"](spark, d).collect()[0]
    n_conv = len({u for u, _, typ in events if typ == "purchase"})
    assert r.n_users == len({u for u, _, _ in events})
    assert r.n_converters == n_conv
    if n_conv:
        assert (
            0
            <= r.p25_minutes
            <= r.p50_minutes
            <= r.p75_minutes
            <= r.p90_minutes
            <= r.max_minutes
        )


@_SET
@given(
    slope=st.integers(min_value=-500, max_value=500),    # cents/day
    intercept=st.integers(min_value=1000, max_value=10**6),
    n_days=st.integers(min_value=3, max_value=15),
)
def test_theil_sen_and_ols_recover_exact_linear_trend(
    spark, tmp_path_factory, slope, intercept, n_days
):
    """On EXACTLY linear daily data both estimators must recover the
    true slope to the cent — every pairwise slope equals it and the
    OLS normal equations are exact in integers."""
    from logicash_etl_spark.queries import QUERIES
    from logicash_etl_spark.schemas import EVENTS

    t0 = dt.datetime(2024, 3, 1, 12)
    rows = [
        (
            i + 1,
            t0 + dt.timedelta(days=i),
            1,
            "click",
            (intercept + slope * i) / 100.0,
            "{}",
        )
        for i in range(n_days)
    ]
    d = str(tmp_path_factory.mktemp("ts"))
    spark.createDataFrame(rows, EVENTS).write.mode("overwrite").parquet(
        f"{d}/events.parquet"
    )
    r = QUERIES["theil_sen_trend"](spark, d).collect()[0]
    assert r.theil_sen_cents_per_day == float(slope)
    assert r.ols_cents_per_day == float(slope)


@_SET
@given(
    events=st.lists(
        st.tuples(
            st.sampled_from(["a", "b", "c"]),
            st.integers(min_value=-5000, max_value=45000),  # cents
        ),
        min_size=1,
        max_size=30,
    )
)
def test_mi_cells_marginals_are_consistent(spark, tmp_path_factory, events):
    """For any population: per-cell marginals must equal the sums of
    the joint over the matching axis, and the total implied by any
    row's marginals is the population size."""
    from collections import defaultdict

    from logicash_etl_spark.queries import QUERIES
    from logicash_etl_spark.schemas import EVENTS

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (i + 1, t0, 1, typ, c / 100.0, "{}")
        for i, (typ, c) in enumerate(events)
    ]
    d = str(tmp_path_factory.mktemp("mi"))
    spark.createDataFrame(rows, EVENTS).write.mode("overwrite").parquet(
        f"{d}/events.parquet"
    )
    out = QUERIES["mutual_information_cells"](spark, d).collect()
    assert sum(r.n_xy for r in out) == len(events)
    by_x, by_y = defaultdict(int), defaultdict(int)
    for r in out:
        by_x[r.event_type] += r.n_xy
        by_y[r.value_band] += r.n_xy
    for r in out:
        assert r.n_x == by_x[r.event_type]
        assert r.n_y == by_y[r.value_band]


@_SET
@given(
    users=st.lists(
        st.integers(min_value=0, max_value=10**9),
        min_size=1,
        max_size=40,
        unique=True,
    )
)
def test_srm_arms_conserve_users(spark, tmp_path_factory, users):
    """Both assignment rows must account for every distinct user, and
    the flag must agree with the chi-square threshold recomputed in
    exact integers."""
    from logicash_etl_spark.queries import QUERIES
    from logicash_etl_spark.schemas import EVENTS

    t0 = dt.datetime(2024, 1, 1)
    rows = [(i + 1, t0, u, "view", 0.0, "{}") for i, u in enumerate(users)]
    d = str(tmp_path_factory.mktemp("srm"))
    spark.createDataFrame(rows, EVENTS).write.mode("overwrite").parquet(
        f"{d}/events.parquet"
    )
    out = QUERIES["srm_check"](spark, d).collect()
    assert {r.assignment for r in out} == {"parity", "md5"}
    for r in out:
        assert r.n_a + r.n_b == len(users)
        n, diff = r.n_a + r.n_b, r.n_a - r.n_b
        exp_ppm = (2_000_000 * diff * diff + n) // (2 * n)
        assert r.chi2_ppm == exp_ppm
        assert r.srm_detected == (exp_ppm > 3841459)


@_SET
@given(
    docs=st.lists(
        st.tuples(
            st.sampled_from(["s1", "s2"]),
            st.integers(min_value=0, max_value=3 * 134217728),  # n_chars
        ),
        min_size=1,
        max_size=12,
    )
)
def test_compaction_ceil_division_invariants(spark, tmp_path_factory, docs):
    """For any source: files = ceil(est/target) exactly, so
    (files-1)*target < est <= files*target; avg_file_bytes = est div
    files; single_file_source iff est < target."""
    from logicash_etl_spark.queries import QUERIES
    from logicash_etl_spark.schemas import DOCUMENTS

    rows = [(i + 1, "x", "en", src, n) for i, (src, n) in enumerate(docs)]
    d = str(tmp_path_factory.mktemp("cp"))
    spark.createDataFrame(rows, DOCUMENTS).write.mode("overwrite").parquet(
        f"{d}/documents.parquet"
    )
    T = 134217728
    out = QUERIES["compaction_plan_report"](spark, d).collect()
    for r in out:
        assert r.files_at_128mib == -(-r.est_bytes // T)  # ceil
        assert (r.files_at_128mib - 1) * T < max(r.est_bytes, 1)
        assert r.est_bytes <= r.files_at_128mib * T
        assert r.avg_file_bytes == r.est_bytes // r.files_at_128mib
        assert r.single_file_source == (r.est_bytes < T)


@_SET
@given(
    walk=st.lists(
        st.sampled_from(["a", "b", "c", "d"]), min_size=3, max_size=15
    )
)
def test_trigrams_match_python_reference(spark, tmp_path_factory, walk):
    """A single user's walk must yield exactly the sliding-window
    trigram multiset (counted in Python)."""
    from collections import Counter

    from logicash_etl_spark.queries import QUERIES
    from logicash_etl_spark.schemas import EVENTS

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (i + 1, t0 + dt.timedelta(minutes=i), 1, typ, 0.0, "{}")
        for i, typ in enumerate(walk)
    ]
    d = str(tmp_path_factory.mktemp("tri"))
    spark.createDataFrame(rows, EVENTS).write.mode("overwrite").parquet(
        f"{d}/events.parquet"
    )
    exp = Counter(
        ">".join(walk[i : i + 3]) for i in range(len(walk) - 2)
    )
    out = QUERIES["event_path_trigrams"](spark, d).collect()
    got = {r.path: r.n_paths for r in out}
    # query reports top-20; a <=15-step walk has <=13 trigrams, all kept
    assert got == dict(exp)


@_SET
@given(
    docs=st.lists(
        st.tuples(
            st.sampled_from(["s1", "s2"]),
            st.text(
                alphabet="abcdefg .!?XYZ",
                min_size=0,
                max_size=60,
            ),
        ),
        min_size=1,
        max_size=15,
    )
)
def test_flesch_counts_match_python_regex(spark, tmp_path_factory, docs):
    """Per-source word/sentence/syllable sums must equal a Python re
    reference for arbitrary text (including empty and unpunctuated
    docs, which the words>=1 filter and the sentences floor handle)."""
    import re
    from collections import defaultdict

    from logicash_etl_spark.queries import QUERIES
    from logicash_etl_spark.schemas import DOCUMENTS

    rows = [
        (i + 1, txt, "en", src, len(txt)) for i, (src, txt) in enumerate(docs)
    ]
    d = str(tmp_path_factory.mktemp("fl"))
    spark.createDataFrame(rows, DOCUMENTS).write.mode("overwrite").parquet(
        f"{d}/documents.parquet"
    )
    exp = defaultdict(lambda: [0, 0, 0, 0])  # docs, words, sents, syll
    for src, txt in docs:
        w = len(re.findall(r"[a-z]+", txt.lower()))
        if w < 1:
            continue
        e = exp[src]
        e[0] += 1
        e[1] += w
        e[2] += max(1, len(re.findall(r"[.!?]+", txt)))
        e[3] += len(re.findall(r"[aeiouy]+", txt.lower()))
    out = {r.source: r for r in QUERIES["flesch_readability_by_source"](spark, d).collect()}
    assert set(out) == set(exp)
    for src, (nd, w, s, y) in exp.items():
        r = out[src]
        assert (r.n_docs, r.sum_words, r.sum_sentences, r.sum_syllables) == (
            nd, w, s, y,
        )
        assert 0 <= r.easy_docs <= r.n_docs


@_SET
@given(
    orders=st.lists(
        st.tuples(
            st.sampled_from(["O", "F", "P"]),
            st.integers(min_value=0, max_value=800),     # age days
            st.integers(min_value=1, max_value=10**6),   # cents
        ),
        min_size=1,
        max_size=25,
    )
)
def test_backlog_aging_conserves_orders_and_money(
    spark, tmp_path_factory, orders
):
    from logicash_etl_spark.queries import QUERIES
    from logicash_etl_spark.schemas import ORDERS

    a = dt.datetime(2024, 12, 31)
    rows = [
        (i + 1, 1, stt, c / 100.0, a - dt.timedelta(days=days), "1")
        for i, (stt, days, c) in enumerate(orders)
    ]
    d = str(tmp_path_factory.mktemp("bl"))
    spark.createDataFrame(rows, ORDERS).write.mode("overwrite").parquet(
        f"{d}/orders.parquet"
    )
    out = QUERIES["order_backlog_aging"](spark, d).collect()
    assert sum(r.n_orders for r in out) == len(orders)
    assert sum(r.value_cents for r in out) == sum(c for _, _, c in orders)
    assert all(
        r.age_bucket in {"0-30d", "31-90d", "91-365d", "366d+"} for r in out
    )


@_SET
@given(
    gaps=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=4),        # user
            st.integers(min_value=0, max_value=60 * 47),  # minutes offset
        ),
        min_size=2,
        max_size=20,
    )
)
def test_km_survival_is_monotone_in_unit_interval(
    spark, tmp_path_factory, gaps
):
    """Kaplan-Meier survival must be non-increasing over duration and
    stay inside [0, 1]; at-risk counts must be non-increasing too."""
    from logicash_etl_spark.queries import QUERIES
    from logicash_etl_spark.schemas import EVENTS

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (i + 1, t0 + dt.timedelta(minutes=m), u, "a", 1.0, "{}")
        for i, (u, m) in enumerate(gaps)
    ]
    d = str(tmp_path_factory.mktemp("km"))
    spark.createDataFrame(rows, EVENTS).write.mode("overwrite").parquet(
        f"{d}/events.parquet"
    )
    out = sorted(
        QUERIES["km_return_time_survival"](spark, d).collect(),
        key=lambda r: r.dur_h,
    )
    prev_s, prev_risk = 1.0 + 1e-9, None
    for r in out:
        assert 0.0 <= r.km_survival <= 1.0
        assert r.km_survival <= prev_s + 1e-9
        prev_s = r.km_survival
        if prev_risk is not None:
            assert r.at_risk <= prev_risk
        prev_risk = r.at_risk


@_SET
@given(
    custs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=24),
            st.sampled_from(["AUTO", "BUILDING"]),
            st.integers(min_value=-9999, max_value=99999),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_privacy_audits_conserve_population(spark, tmp_path_factory, custs):
    """k-anonymity must account for every record at BOTH QI levels;
    l-diversity's achieved_l is at least 1 and its exposed masses
    never exceed the population."""
    from logicash_etl_spark.queries import QUERIES
    from logicash_etl_spark.schemas import CUSTOMER

    rows = [
        (i + 1, f"c{i}", n, b / 100.0, seg)
        for i, (n, seg, b) in enumerate(custs)
    ]
    d = str(tmp_path_factory.mktemp("ka"))
    spark.createDataFrame(rows, CUSTOMER).write.mode("overwrite").parquet(
        f"{d}/customer.parquet"
    )
    ka = {r.qi_level: r for r in QUERIES["k_anonymity_report"](spark, d).collect()}
    assert set(ka) == {"coarse", "fine"}
    for r in ka.values():
        assert r.n_records == len(rows)
        assert 1 <= r.achieved_k <= len(rows)
        assert 0 <= r.records_at_risk_lt5 <= len(rows)
    ld = QUERIES["l_diversity_report"](spark, d).collect()[0]
    assert ld.n_records == len(rows)
    assert ld.achieved_l >= 1
    assert 0 <= ld.records_l_lt3 <= len(rows)
