"""Unit tests for the round-9 operators: hand-checkable math behind
the oracle-paired queries — cross-source passage overlap on a 3-doc
corpus, the JL projection's exact single-coordinate invariant, and
CUSUM on a crafted level shift."""

from __future__ import annotations

import datetime as dt

from logicash_etl_spark.schemas import DOCUMENTS, EMBEDDINGS, EVENTS


def test_source_overlap_counts_shared_passages(spark, tmp_path):
    """Two sources sharing exactly one 8-word passage: the matrix must
    report shared_passages=1 and overlap_coeff = 1 / min(|A|, |B|)."""
    from logicash_etl_spark.queries import QUERIES

    shared = " ".join(f"p{i}" for i in range(8))  # exactly 1 shingle
    other = " ".join(f"q{i}" for i in range(8))
    docs = spark.createDataFrame(
        [
            (1, shared, "en", "srcA", len(shared)),
            (2, other, "en", "srcA", len(other)),
            (3, shared, "en", "srcB", len(shared)),
        ],
        DOCUMENTS,
    )
    d = str(tmp_path / "mini")
    docs.write.parquet(f"{d}/documents.parquet")
    rows = QUERIES["source_overlap_matrix"](spark, d).collect()
    assert len(rows) == 1
    r = rows[0]
    # srcA holds 2 distinct passages, srcB holds 1; 1 shared
    assert (r.source_a, r.source_b) == ("srcA", "srcB")
    assert r.shared_passages == 1
    assert r.overlap_coeff == 1.0  # 1 / min(2, 1)


def test_jl_single_coordinate_distance_is_exact(spark, tmp_path):
    """A pair differing by 1.0 in ONE coordinate has d2 = 1 and
    p2 = sum_j (0.25 * s_jc)^2 = 16 * 0.0625 = 1 EXACTLY (every
    column of the Rademacher matrix has unit norm after the 1/sqrt(k)
    scale) — so the distortion ratio must be exactly 1.0 at ppm
    precision, for any coordinate and any sign pattern."""
    from logicash_etl_spark.queries import QUERIES

    base = [0.0] * 64
    bumped = list(base)
    bumped[37] = 1.0
    emb = spark.createDataFrame(
        [(1, base, 7), (2, bumped, 7)], EMBEDDINGS
    )
    d = str(tmp_path / "mini")
    emb.write.parquet(f"{d}/embeddings.parquet")
    rows = QUERIES["jl_projection_distortion"](spark, d).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.label == 7 and r.n_pairs == 1
    assert r.mean_ratio == 1.0
    assert r.min_ratio == 1.0 and r.max_ratio == 1.0
    assert r.frac_within_30pct == 1.0


def test_cusum_peaks_at_level_shift(spark, tmp_path):
    """A series of 10 days at 100.00 then 10 days at 200.00: the mean
    is 150, CUSUM after day i<=10 is -50*i (in currency), so the
    |CUSUM| argmax is exactly day 10 with deviation-sum -500.00
    (cusum_cents = -50000) and cusum_scaled = n*prefix - i*S =
    20*100000 - 10*300000 = -1_000_000."""
    from logicash_etl_spark.queries import QUERIES

    rows = [
        (
            i,
            dt.datetime(2024, 1, 1 + i),
            i % 3,
            "purchase",
            100.0 if i < 10 else 200.0,
            "{}",
        )
        for i in range(20)
    ]
    d = str(tmp_path / "mini")
    spark.createDataFrame(rows, EVENTS).write.parquet(
        f"{d}/events.parquet"
    )
    out = QUERIES["cusum_changepoint_report"](spark, d).collect()
    top = {r.rank: r for r in out}
    assert top[1].day == dt.datetime(2024, 1, 10)
    assert top[1].cusum_scaled == -1_000_000
    assert top[1].cusum_cents == -50_000
    # neighbors of the shift rank next (|cusum| = 450 on both sides)
    assert {top[2].day, top[3].day} == {
        dt.datetime(2024, 1, 9),
        dt.datetime(2024, 1, 11),
    }


def test_mmr_skips_the_duplicate_topk_would_take(spark):
    """Crafted 3-vector pool against q = e1 (all values dyadic, exact
    in float32): v1 = (.5, .375, 0) has rel = 0.8; v2 = v1 exactly
    (the near-copy plain top-2 would also take, cos(v2, v1) = 1);
    v3 = (.375, 0, .5) has rel = 0.6 and cos(v3, v1) = 0.48. Greedy
    MMR at lam = 0.7 picks v1 (0.56), then must SKIP the duplicate
    (0.7*0.8 - 0.3*1.0 = 0.26) for the diverse v3
    (0.7*0.6 - 0.3*0.48 = 0.276)."""
    from logicash_etl_spark.operators.similarity import mmr_select

    pad = [0.0] * 61
    pool = spark.createDataFrame(
        [
            (1, [0.5, 0.375, 0.0] + pad, 0),
            (2, [0.5, 0.375, 0.0] + pad, 0),
            (3, [0.375, 0.0, 0.5] + pad, 0),
        ],
        "vec_id long, embedding array<float>, label int",
    )
    q = [1.0, 0.0, 0.0] + pad
    out = {r.rank: r for r in mmr_select(pool, q, k=2, lam=0.7).collect()}
    assert out[1].vec_id == 1 and abs(out[1].mmr_score - 0.56) < 1e-9
    assert out[2].vec_id == 3 and abs(out[2].mmr_score - 0.276) < 1e-9


def _py_hilbert(order: int, x: int, y: int) -> int:
    n = 1 << order
    d, s = 0, n // 2
    while s > 0:
        rx = 1 if (x & s) else 0
        ry = 1 if (y & s) else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x, y = n - 1 - x, n - 1 - y
            x, y = y, x
        s //= 2
    return d


def _duck_hilbert(order: int):
    """Run the generated stage SQL in DuckDB over the FULL order-n
    grid; returns {(x, y): d}."""
    import duckdb

    from logicash_etl_spark.queries.advanced import _hilbert_stage_sql

    n = 1 << order
    sql = (
        f"WITH h0 AS (SELECT a.x, b.y, a.x AS x0, b.y AS y0,"
        f" CAST(0 AS BIGINT) AS d"
        f" FROM (SELECT unnest(range({n})) AS x) a,"
        f" (SELECT unnest(range({n})) AS y) b)"
    )
    prev = "h0"
    for i in range(order):
        st = _hilbert_stage_sql(1 << (order - 1 - i), n)
        sql += (
            f", h{i + 1} AS (SELECT {st['x']} AS x, {st['y']} AS y,"
            f" x0, y0, {st['d']} AS d FROM {prev})"
        )
        prev = f"h{i + 1}"
    sql += f" SELECT x0, y0, d FROM {prev}"
    return {
        (r[0], r[1]): r[2] for r in duckdb.sql(sql).fetchall()
    }


def test_hilbert_sql_matches_python_reference():
    """The generated stage SQL must agree with an independent Python
    xy->d implementation on every cell of an order-4 (16x16) grid."""
    got = _duck_hilbert(4)
    for (x, y), d in got.items():
        assert d == _py_hilbert(4, x, y), (x, y, d)


def test_hilbert_is_a_space_filling_curve():
    """The defining properties on the full order-4 grid: the mapping
    is a bijection onto [0, 256) and CONSECUTIVE d values are always
    grid-adjacent (the continuity Z-order lacks — Morton has |d|
    jumps at quadrant seams, which is exactly why the layout report
    measures tighter Hilbert boxes at non-aligned file counts)."""
    got = _duck_hilbert(4)
    inv = {d: xy for xy, d in got.items()}
    assert sorted(inv) == list(range(256))
    for d in range(255):
        (x1, y1), (x2, y2) = inv[d], inv[d + 1]
        assert abs(x1 - x2) + abs(y1 - y2) == 1, (d, inv[d], inv[d + 1])


def test_k_anonymity_hand_fixture(spark, tmp_path):
    """4 customers: two share (nation 1, 'AUTO'), two are unique at
    the coarse level already. coarse: 3 classes, achieved k = 1,
    2 uniques, all 4 records in classes < 5 -> 100% at risk. fine
    (+1000-wide acctbal band) splits the shared pair (100.0 vs
    2500.0): 4 singleton classes."""
    from logicash_etl_spark.queries import QUERIES
    from logicash_etl_spark.schemas import CUSTOMER

    rows = [
        (1, "a", 1, 100.0, "AUTO"),
        (2, "b", 1, 2500.0, "AUTO"),
        (3, "c", 2, 100.0, "AUTO"),
        (4, "d", 1, 100.0, "BUILDING"),
    ]
    d = str(tmp_path / "mini")
    spark.createDataFrame(rows, CUSTOMER).write.parquet(
        f"{d}/customer.parquet"
    )
    out = {
        r.qi_level: r for r in QUERIES["k_anonymity_report"](spark, d).collect()
    }
    c, f = out["coarse"], out["fine"]
    assert (c.n_classes, c.achieved_k, c.unique_classes) == (3, 1, 2)
    assert c.records_at_risk_lt5 == 4 and c.pct_at_risk_lt5 == 100.0
    assert (f.n_classes, f.achieved_k, f.unique_classes) == (4, 1, 4)


def test_km_life_table_hand_fixture(spark, tmp_path):
    """2 users, 5 gap observations with known durations:
    d=0h: 1 return + 1 censored; d=1h: 1 return + 1 censored;
    d=2h: 1 return and nobody left. at_risk = 5, 3, 1;
    KM = 0.8, 0.8*(2/3) = 0.533333, then the everyone-churns row
    must hit the dead-flag path and pin survival to exactly 0.0
    (ln(0) is an ERROR in DuckDB and NULL in Spark — the flag is
    what keeps both engines identical)."""
    import datetime as dt

    from logicash_etl_spark.queries import QUERIES
    from logicash_etl_spark.schemas import EVENTS

    t0 = dt.datetime(2024, 1, 1)
    m = lambda minutes: t0 + dt.timedelta(minutes=minutes)  # noqa: E731
    rows = [
        # user 1: one 1.5h-gap pair, then censored 1.5h before horizon
        (1, m(0), 1, "a", 1.0, "{}"),
        (2, m(90), 1, "a", 1.0, "{}"),
        # user 2: a 30-min gap, a 2.5h gap, last event AT the horizon
        (3, m(0), 2, "a", 1.0, "{}"),
        (4, m(30), 2, "a", 1.0, "{}"),
        (5, m(180), 2, "a", 1.0, "{}"),
    ]
    d = str(tmp_path / "mini")
    spark.createDataFrame(rows, EVENTS).write.parquet(
        f"{d}/events.parquet"
    )
    out = {
        r.dur_h: r
        for r in QUERIES["km_return_time_survival"](spark, d).collect()
    }
    assert (out[0].at_risk, out[0].churned, out[0].n_censored) == (5, 1, 1)
    assert (out[1].at_risk, out[1].churned, out[1].n_censored) == (3, 1, 1)
    assert (out[2].at_risk, out[2].churned, out[2].n_censored) == (1, 1, 0)
    assert out[0].km_survival == 0.8
    assert out[1].km_survival == 0.533333
    assert out[2].km_survival == 0.0


def _msprt_fixture(spark, tmp_path, a_vals, b_vals, days=4):
    import datetime as dt

    from logicash_etl_spark.schemas import EVENTS

    rows = []
    eid = 0
    for d in range(days):
        ts = dt.datetime(2024, 1, 1 + d, 12)
        for u, v in [(0, a_vals[0]), (2, a_vals[1]),
                     (1, b_vals[0]), (3, b_vals[1])]:
            rows.append((eid, ts, u, "a", float(v), "{}"))
            eid += 1
    p = str(tmp_path / "mini")
    spark.createDataFrame(rows, EVENTS).write.parquet(
        f"{p}/events.parquet"
    )
    return p


def test_msprt_detects_large_effect(spark, tmp_path):
    """Arm A pays ~200, arm B ~100 (within-arm variance 200 after
    day 1): V = 200, logLambda = 0.5*ln(200/300) + 1e6/(2*200*300)
    ~ 8.13 >> ln 20 — significant from the FIRST day, and
    ever_significant latches."""
    from logicash_etl_spark.queries import QUERIES

    d = _msprt_fixture(spark, tmp_path, (190, 210), (90, 110))
    out = QUERIES["sequential_ab_msprt"](spark, d).collect()
    assert len(out) == 4
    assert all(r.significant and r.ever_significant for r in out)
    assert all(r.mean_diff == 100.0 for r in out)


def test_msprt_null_effect_never_fires(spark, tmp_path):
    """Identical arms: delta = 0, so logLambda = 0.5*ln(V/(V+100))
    < 0 every day — the always-valid monitor must never fire no
    matter how often it is peeked at."""
    from logicash_etl_spark.queries import QUERIES

    d = _msprt_fixture(spark, tmp_path, (90, 110), (90, 110))
    out = QUERIES["sequential_ab_msprt"](spark, d).collect()
    assert len(out) == 4
    assert not any(r.significant or r.ever_significant for r in out)
    assert all(r.log_lambda < 0 for r in out)


def test_l_diversity_flags_homogeneous_class(spark, tmp_path):
    """A class can be k-anonymous yet 1-diverse (homogeneity attack):
    3 customers share QI (nation 1, AUTO) AND the same balance band
    -> l = 1 for that class; a second class (nation 2) holds two
    distinct bands -> l = 2. achieved_l = 1, one weak class of size
    3, 3 records exposed."""
    from logicash_etl_spark.queries import QUERIES
    from logicash_etl_spark.schemas import CUSTOMER

    rows = [
        (1, "a", 1, 100.0, "AUTO"),
        (2, "b", 1, 200.0, "AUTO"),   # same 0-band as 100.0
        (3, "c", 1, 900.0, "AUTO"),   # still band 0
        (4, "d", 2, 100.0, "AUTO"),
        (5, "e", 2, 2500.0, "AUTO"),  # band 2
    ]
    d = str(tmp_path / "mini")
    spark.createDataFrame(rows, CUSTOMER).write.parquet(
        f"{d}/customer.parquet"
    )
    r = QUERIES["l_diversity_report"](spark, d).collect()[0]
    assert (r.n_classes, r.n_records, r.achieved_l) == (2, 5, 1)
    assert (r.classes_l_lt3, r.records_l_lt3) == (2, 5)
    assert r.smallest_weak_class == 2


def test_t_closeness_emd_hand_fixture(spark, tmp_path):
    """Skewness attack on a 6-customer, 2-band corpus (global 50/50):
    class nation-1 is ALL band 0 and class nation-2 ALL band 2 —
    each has ordered-EMD |1.0 - 0.5| = 0.5 exactly (ppm 500000,
    via (2e6*6 + 12) div 24 = 500000 in pure integers) and both
    cross t = 0.2; class nation-3 mirrors the global distribution
    exactly, so its EMD must be exactly 0 (the +d/2d half-up
    rounding must not lift it)."""
    from logicash_etl_spark.queries import QUERIES
    from logicash_etl_spark.schemas import CUSTOMER

    rows = [
        (1, "a", 1, 100.0, "AUTO"),   # band 0
        (2, "b", 1, 900.0, "AUTO"),   # band 0
        (3, "c", 2, 2500.0, "AUTO"),  # band 2
        (4, "d", 2, 2600.0, "AUTO"),  # band 2
        (5, "e", 3, 100.0, "AUTO"),   # band 0
        (6, "f", 3, 2500.0, "AUTO"),  # band 2
    ]
    d = str(tmp_path / "mini")
    spark.createDataFrame(rows, CUSTOMER).write.parquet(
        f"{d}/customer.parquet"
    )
    r = QUERIES["t_closeness_report"](spark, d).collect()[0]
    assert (r.n_classes, r.n_bands) == (3, 2)
    assert r.max_emd_ppm == 500000
    assert (r.classes_above_t, r.records_above_t) == (2, 4)


def test_rfm_scores_and_segments_hand_fixture(spark, tmp_path):
    """5 customers with aligned rank profiles (rec 0/10/20/30/40 days,
    freq 5/4/3/2/1 orders, spend 500/400/300/200/100): the type-7
    cuts quantize to rc=[8,16,24,32], fc=[2,3,3,4],
    mc=[18000,26000,34000,42000], giving scores r=5..1, f=5,4,2,1,1,
    m=5..1 — so A,B are champions (both also m>=4 big spenders),
    C falls through every named branch to needs_attention, and D,E
    are hibernating. All sums are hand-added integers/cents."""
    import datetime as dt

    from logicash_etl_spark.queries import QUERIES
    from logicash_etl_spark.schemas import ORDERS

    day = lambda d: dt.datetime(2024, 12, 31) - dt.timedelta(days=d)  # noqa: E731
    rows = []
    k = 0
    # (cust, rec_days_of_last, n_orders) — each order 100.00
    for cust, rec, n in [(1, 0, 5), (2, 10, 4), (3, 20, 3), (4, 30, 2), (5, 40, 1)]:
        for j in range(n):
            k += 1
            # last order at `rec` days before asof; earlier ones older
            rows.append((k, cust, "F", 100.0, day(rec + j * 30), "1-URGENT"))
    d = str(tmp_path / "mini")
    spark.createDataFrame(rows, ORDERS).write.parquet(f"{d}/orders.parquet")
    out = {r.segment: r for r in QUERIES["rfm_segmentation"](spark, d).collect()}
    assert set(out) == {"champions", "needs_attention", "hibernating"}
    ch = out["champions"]
    assert (ch.n_customers, ch.sum_recency_days, ch.sum_orders) == (2, 10, 9)
    assert (ch.total_monetary_cents, ch.big_spenders) == (90000, 2)
    na = out["needs_attention"]
    assert (na.n_customers, na.sum_recency_days, na.sum_orders) == (1, 20, 3)
    assert (na.total_monetary_cents, na.big_spenders) == (30000, 0)
    hb = out["hibernating"]
    assert (hb.n_customers, hb.sum_recency_days, hb.sum_orders) == (2, 70, 3)
    assert (hb.total_monetary_cents, hb.big_spenders) == (30000, 0)


def test_theil_sen_ignores_the_outlier_ols_chases(spark, tmp_path):
    """One event type, 5 days, one event per day with daily cents
    100,200,300,400 then a 10000-cent outlier day. 6 of the 10 pair
    slopes are exactly 100 c/day, so the type-7 median is 100.00 —
    while OLS is dragged to (5*42000 - 10*11000)/(5*30 - 100) = 2000
    exactly. The gap is the estimator's 29% breakdown point made
    visible."""
    import datetime as dt

    from logicash_etl_spark.queries import QUERIES
    from logicash_etl_spark.schemas import EVENTS

    t0 = dt.datetime(2024, 1, 1, 12, 0)
    vals = [1.0, 2.0, 3.0, 4.0, 100.0]  # dollars -> cents x100
    rows = [
        (i + 1, t0 + dt.timedelta(days=i), 1, "click", v, "{}")
        for i, v in enumerate(vals)
    ]
    d = str(tmp_path / "mini")
    spark.createDataFrame(rows, EVENTS).write.parquet(
        f"{d}/events.parquet"
    )
    r = QUERIES["theil_sen_trend"](spark, d).collect()
    assert len(r) == 1
    row = r[0]
    assert (row.event_type, row.n_days, row.n_pairs) == ("click", 5, 10)
    assert row.theil_sen_cents_per_day == 100.0
    assert row.ols_cents_per_day == 2000.0


def _hrw_py(key: str, n_shards: int) -> int:
    """Independent Python reference for the HRW assignment: top 14
    hex chars of md5(key||':s:') as the weight, shard id packed into
    the low 4 bits, argmax, unpack."""
    import hashlib

    best = -1
    for s in range(n_shards):
        h = hashlib.md5(f"{key}:{s}:".encode()).hexdigest()
        packed = int(h[:14], 16) * 16 + s
        best = max(best, packed)
    return best % 16


def test_rendezvous_matches_python_and_moves_minimally(spark, tmp_path):
    """20 docs: (a) per-shard counts at N=8 must equal the independent
    hashlib reference exactly; (b) the HRW contract — shards 0..7
    keep their weights when shard 8 joins, so moved_in is 0 for every
    old shard and every moved doc lands on shard 8."""
    from collections import Counter

    from logicash_etl_spark.queries import QUERIES
    from logicash_etl_spark.schemas import DOCUMENTS

    ids = list(range(1, 21))
    rows = [(i, f"doc {i}", "en", "src", 5) for i in ids]
    d = str(tmp_path / "mini")
    spark.createDataFrame(rows, DOCUMENTS).write.parquet(
        f"{d}/documents.parquet"
    )
    exp8 = Counter(_hrw_py(str(i), 8) for i in ids)
    exp9 = Counter(_hrw_py(str(i), 9) for i in ids)
    out = {r.shard: r for r in QUERIES["rendezvous_shard_balance"](spark, d).collect()}
    for s, r in out.items():
        assert r.n_docs_8 == exp8.get(s, 0), f"shard {s} n8"
        assert r.n_docs_9 == exp9.get(s, 0), f"shard {s} n9"
        if s < 8:
            assert r.moved_in == 0, f"old shard {s} gained docs on resize"
    assert sum(r.n_docs_8 for r in out.values()) == 20
    assert sum(r.n_docs_9 for r in out.values()) == 20
    if 8 in out:
        assert out[8].moved_in == out[8].n_docs_9


def test_attribution_remainder_and_window_hand_fixture(spark, tmp_path):
    """User 1: click then view, purchase 300 cents -> view is last
    touch (300 c), linear 150e6 microcents each. User 2: three
    touches (click, click, signup), purchase 100 cents -> each gets
    floor(1e8/3) = 33333333 with the +1 remainder pinned to the
    LAST touch (signup), so totals stay exact. User 3's only touch is
    8 days before the purchase -> outside the window, conversion
    unattributed. Invariant: sum(linear) = 1e6 * attributed cents."""
    import datetime as dt

    from logicash_etl_spark.queries import QUERIES
    from logicash_etl_spark.schemas import EVENTS

    t0 = dt.datetime(2024, 6, 10, 12, 0)
    h = lambda x: t0 + dt.timedelta(hours=x)  # noqa: E731
    rows = [
        # user 1
        (1, h(0), 1, "click", 0.0, "{}"),
        (2, h(1), 1, "view", 0.0, "{}"),
        (3, h(2), 1, "purchase", 3.0, "{}"),
        # user 2 — indivisible 100 cents across 3 touches
        (4, h(0), 2, "click", 0.0, "{}"),
        (5, h(1), 2, "click", 0.0, "{}"),
        (6, h(2), 2, "signup", 0.0, "{}"),
        (7, h(3), 2, "purchase", 1.0, "{}"),
        # user 3 — touch 8 days before purchase: outside the window
        (8, h(0), 3, "view", 0.0, "{}"),
        (9, h(192), 3, "purchase", 9.0, "{}"),
    ]
    d = str(tmp_path / "mini")
    spark.createDataFrame(rows, EVENTS).write.parquet(
        f"{d}/events.parquet"
    )
    out = {
        r.event_type: r
        for r in QUERIES["multi_touch_attribution"](spark, d).collect()
    }
    assert set(out) == {"click", "view", "signup"}
    assert (out["view"].last_touch_cents, out["view"].linear_microcents) == (
        300,
        150_000_000,
    )
    assert (out["click"].n_touches, out["click"].last_touch_cents) == (3, 0)
    assert (
        out["click"].linear_microcents
        == 150_000_000 + 2 * 33_333_333
    )
    assert (
        out["signup"].last_touch_cents,
        out["signup"].linear_microcents,
    ) == (100, 33_333_334)
    total_linear = sum(r.linear_microcents for r in out.values())
    assert total_linear == 1_000_000 * 400  # user 3's 900 c unattributed


def test_mutual_information_dependence_and_independence(spark, tmp_path):
    """Perfectly dependent 2x2 (type a always band 0, b always band
    1): each cell contributes 0.5*ln(2) = 0.346574 and the implied
    MI is ln(2). Perfectly independent 2x2 (every cell count 1):
    every contribution is exactly 0.0 (ln(1))."""
    import datetime as dt

    from logicash_etl_spark.queries import QUERIES
    from logicash_etl_spark.schemas import EVENTS

    t0 = dt.datetime(2024, 1, 1)
    dep = [
        (1, t0, 1, "a", 50.0, "{}"),
        (2, t0, 1, "a", 50.0, "{}"),
        (3, t0, 1, "b", 150.0, "{}"),
        (4, t0, 1, "b", 150.0, "{}"),
    ]
    ind = [
        (1, t0, 1, "a", 50.0, "{}"),
        (2, t0, 1, "a", 150.0, "{}"),
        (3, t0, 1, "b", 50.0, "{}"),
        (4, t0, 1, "b", 150.0, "{}"),
    ]
    for name, rows in [("dep", dep), ("ind", ind)]:
        d = str(tmp_path / name)
        spark.createDataFrame(rows, EVENTS).write.parquet(
            f"{d}/events.parquet"
        )
    out = QUERIES["mutual_information_cells"](spark, str(tmp_path / "dep")).collect()
    assert len(out) == 2
    for r in out:
        assert r.n_xy == 2 and r.n_x == 2 and r.n_y == 2
        assert r.mi_contrib_nats == 0.346574  # 0.5 * ln 2, 6dp
    out = QUERIES["mutual_information_cells"](spark, str(tmp_path / "ind")).collect()
    assert len(out) == 4
    for r in out:
        assert r.mi_contrib_nats == 0.0


def test_compaction_plan_ceil_division_boundaries(spark, tmp_path):
    """Source 'big' lands on exactly 2 x 128 MiB estimated bytes ->
    exactly 2 files of exactly 134217728 B (the ceil-division must
    not produce 3); 1 doc div 2 files -> 0 rows_per_file (integer
    semantics, not a rounding). Source 'tiny' fits one file and is
    flagged single_file_source."""
    from logicash_etl_spark.queries import QUERIES
    from logicash_etl_spark.schemas import DOCUMENTS

    rows = [
        (1, "x", "en", "big", 2 * 134217728 - 64),
        (2, "y", "en", "tiny", 100),
        (3, "z", "en", "tiny", 100),
        (4, "w", "en", "tiny", 100),
    ]
    d = str(tmp_path / "mini")
    spark.createDataFrame(rows, DOCUMENTS).write.parquet(
        f"{d}/documents.parquet"
    )
    out = {r.source: r for r in QUERIES["compaction_plan_report"](spark, d).collect()}
    big, tiny = out["big"], out["tiny"]
    assert big.est_bytes == 2 * 134217728
    assert (big.files_at_128mib, big.avg_file_bytes) == (2, 134217728)
    assert (big.rows_per_file, big.single_file_source) == (0, False)
    assert tiny.est_bytes == 300 + 3 * 64
    assert (tiny.files_at_128mib, tiny.rows_per_file) == (1, 3)
    assert tiny.single_file_source is True


def test_event_path_trigrams_respect_user_boundaries(spark, tmp_path):
    """User 1 walks a,b,c,d (trigrams a>b>c and b>c>d); user 2 walks
    a,b,c (a second a>b>c); user 3 emits only two events — no
    trigram, and crucially no c,d -> x,y spill across the user
    boundary. Top row must be a>b>c with n=2."""
    import datetime as dt

    from logicash_etl_spark.queries import QUERIES
    from logicash_etl_spark.schemas import EVENTS

    t0 = dt.datetime(2024, 1, 1)
    m = lambda k: t0 + dt.timedelta(minutes=k)  # noqa: E731
    rows = [
        (1, m(0), 1, "a", 0.0, "{}"),
        (2, m(1), 1, "b", 0.0, "{}"),
        (3, m(2), 1, "c", 0.0, "{}"),
        (4, m(3), 1, "d", 0.0, "{}"),
        (5, m(0), 2, "a", 0.0, "{}"),
        (6, m(1), 2, "b", 0.0, "{}"),
        (7, m(2), 2, "c", 0.0, "{}"),
        (8, m(0), 3, "x", 0.0, "{}"),
        (9, m(1), 3, "y", 0.0, "{}"),
    ]
    d = str(tmp_path / "mini")
    spark.createDataFrame(rows, EVENTS).write.parquet(
        f"{d}/events.parquet"
    )
    out = QUERIES["event_path_trigrams"](spark, d).collect()
    assert [(r.path, r.n_paths) for r in out] == [
        ("a>b>c", 2),
        ("b>c>d", 1),
    ]


def _ltv_fixture(spark, tmp_path):
    import datetime as dt

    from logicash_etl_spark.schemas import EVENTS

    d = dt.datetime
    rows = [
        # user 1: cohort week of Mon 2024-01-01; purchases at age 0 and 1
        (1, d(2024, 1, 1, 10), 1, "signup", 0.0, "{}"),
        (2, d(2024, 1, 1, 11), 1, "purchase", 1.0, "{}"),
        (3, d(2024, 1, 9, 10), 1, "purchase", 2.0, "{}"),   # day 8 -> age 1
        # user 2: same cohort week (Tue), purchase 6 days on -> age 0
        (4, d(2024, 1, 2, 9), 2, "view", 0.0, "{}"),
        (5, d(2024, 1, 8, 9), 2, "purchase", 4.0, "{}"),
        # user 3: next cohort week, never converts
        (6, d(2024, 1, 9, 9), 3, "view", 0.0, "{}"),
    ]
    p = str(tmp_path / "mini")
    spark.createDataFrame(rows, EVENTS).write.parquet(f"{p}/events.parquet")
    return p


def test_cohort_ltv_per_user_anchoring(spark, tmp_path):
    """User 2's purchase is 6 days after their OWN first event, so it
    lands in age_week 0 even though it happens in the next calendar
    week — per-user anchoring, not calendar bucketing. Cohort
    2024-01-01 has 2 users: age 0 revenue 500 c (cum 500, ltv
    250e6 microcents/user), age 1 revenue 200 c (cum 700, ltv
    350e6). The non-converting cohort emits no rows."""
    from logicash_etl_spark.queries import QUERIES

    p = _ltv_fixture(spark, tmp_path)
    out = sorted(
        QUERIES["cohort_ltv_curve"](spark, p).collect(),
        key=lambda r: r.age_week,
    )
    assert len(out) == 2
    a0, a1 = out
    assert str(a0.cohort_week) == "2024-01-01" and a0.cohort_users == 2
    assert (a0.revenue_cents, a0.cum_revenue_cents) == (500, 500)
    assert a0.ltv_microcents_per_user == 250_000_000
    assert (a1.age_week, a1.revenue_cents, a1.cum_revenue_cents) == (1, 200, 700)
    assert a1.ltv_microcents_per_user == 350_000_000


def test_time_to_convert_excludes_nonconverters(spark, tmp_path):
    """Delays are 60 min (user 1) and 8640 min (user 2); user 3 never
    converts — counted in n_users, excluded from the distribution.
    Type-7 quartiles of [60, 8640]: p25 = 2205, p50 = 4350,
    p75 = 6495, p90 = 7782."""
    from logicash_etl_spark.queries import QUERIES

    p = _ltv_fixture(spark, tmp_path)
    r = QUERIES["time_to_convert_percentiles"](spark, p).collect()[0]
    assert (r.n_users, r.n_converters, r.max_minutes) == (3, 2, 8640)
    assert (r.p25_minutes, r.p50_minutes) == (2205.0, 4350.0)
    assert (r.p75_minutes, r.p90_minutes) == (6495.0, 7782.0)


def test_ri_audit_counts_the_planted_orphan(spark, tmp_path):
    """Copy the sf0.001 star schema (FK-consistent by construction)
    and plant ONE orphan order pointing at customer 999999: the
    orders edge must report exactly 1 orphan and every other edge 0."""
    import datetime as dt

    from logicash_etl_spark.queries import QUERIES
    from logicash_etl_spark.schemas import ORDERS

    src = "/root/testdata/sf0.001"
    d = str(tmp_path / "mini")
    for t in ["customer", "lineitem", "part", "supplier", "nation", "region"]:
        spark.read.parquet(f"{src}/{t}.parquet").write.parquet(
            f"{d}/{t}.parquet"
        )
    orders = spark.read.parquet(f"{src}/orders.parquet")
    orphan = spark.createDataFrame(
        [(10**9, 999999, "F", 1.0, dt.datetime(2024, 1, 1), "1-URGENT")],
        ORDERS,
    )
    n_orders = orders.count()
    orders.select(*ORDERS.fieldNames()).unionByName(orphan).write.parquet(
        f"{d}/orders.parquet"
    )
    out = {r.fk_edge: r for r in QUERIES["referential_integrity_audit"](spark, d).collect()}
    assert len(out) == 7
    oc = out["orders.o_custkey -> customer"]
    assert (oc.n_child_rows, oc.n_orphans) == (n_orders + 1, 1)
    for edge, r in out.items():
        if edge != "orders.o_custkey -> customer":
            assert r.n_orphans == 0, edge


def test_weekday_chi2_hand_fixture(spark, tmp_path):
    """Three Monday events and one Tuesday event, one type: expected
    count is 2 per observed day, so both cells contribute
    (obs-2)^2/2 = 0.5 exactly, and weekday must be Monday=0 on the
    Spark side (weekday(), not dayofweek())."""
    import datetime as dt

    from logicash_etl_spark.queries import QUERIES
    from logicash_etl_spark.schemas import EVENTS

    mon, tue = dt.datetime(2024, 1, 1, 9), dt.datetime(2024, 1, 2, 9)
    rows = [
        (1, mon, 1, "a", 0.0, "{}"),
        (2, mon, 1, "a", 0.0, "{}"),
        (3, mon, 2, "a", 0.0, "{}"),
        (4, tue, 2, "a", 0.0, "{}"),
    ]
    d = str(tmp_path / "mini")
    spark.createDataFrame(rows, EVENTS).write.parquet(f"{d}/events.parquet")
    out = {r.weekday: r for r in QUERIES["weekday_seasonality_report"](spark, d).collect()}
    assert set(out) == {0, 1}
    assert (out[0].n, out[0].n_type, out[0].chi2_contrib) == (3, 4, 0.5)
    assert (out[1].n, out[1].chi2_contrib) == (1, 0.5)


def test_flesch_hand_counts_and_negative_floor(spark, tmp_path):
    """Three single-doc sources: 'The cat sat. The dog ran.' counts
    6 words / 2 sentences / 6 syllable groups -> 119.19; a lone
    unpunctuated word exercises the sentences>=1 floor; a dense
    3-word latinate doc goes NEGATIVE, exercising half-up
    quantization below zero (expected value recomputed with the
    same IEEE expression in Python)."""
    import math

    from logicash_etl_spark.queries import QUERIES
    from logicash_etl_spark.schemas import DOCUMENTS

    rows = [
        (1, "The cat sat. The dog ran.", "en", "A", 26),
        (2, "strength", "en", "B", 8),
        (3, "extraordinary bureaucratic organization", "en", "C", 40),
    ]
    d = str(tmp_path / "mini")
    spark.createDataFrame(rows, DOCUMENTS).write.parquet(
        f"{d}/documents.parquet"
    )
    out = {r.source: r for r in QUERIES["flesch_readability_by_source"](spark, d).collect()}
    a = out["A"]
    assert (a.sum_words, a.sum_sentences, a.sum_syllables) == (6, 2, 6)
    assert a.sum_flesch_x100 == 11919 and a.easy_docs == 1
    b = out["B"]
    assert (b.sum_words, b.sum_sentences, b.sum_syllables) == (1, 1, 1)
    assert b.sum_flesch_x100 == 12122
    c = out["C"]
    assert (c.sum_words, c.sum_sentences, c.sum_syllables) == (3, 1, 14)
    exp_c = math.floor(
        100.0 * (206.835 - 1.015 * (3.0 / 1) - 84.6 * (14.0 / 3)) + 0.5
    )
    assert c.sum_flesch_x100 == exp_c and exp_c < 0
    assert c.easy_docs == 0


def test_abc_whale_and_exact_boundary(spark, tmp_path):
    """Part revenues 850/100/30/20 cents (total 1000): the whale
    crosses 80% alone but classifies A (exclusive-prefix rule,
    excl=0); the 100-cent part has excl 85% -> B; the 30-cent part
    sits EXACTLY at 95% exclusive -> C (strict <); shares are
    half-up basis points (A = 8500 from 8500.5 down... floor-div of
    (20000*850+1000)/2000)."""
    import datetime as dt

    from logicash_etl_spark.queries import QUERIES
    from logicash_etl_spark.schemas import LINEITEM

    t = dt.datetime(2024, 1, 1)
    rows = [
        (1, 1, 1, 1, 1.0, 8.50, 0.0, 0.0, "N", "O", t),
        (2, 2, 1, 1, 1.0, 1.00, 0.0, 0.0, "N", "O", t),
        (3, 3, 1, 1, 1.0, 0.30, 0.0, 0.0, "N", "O", t),
        (4, 4, 1, 1, 1.0, 0.20, 0.0, 0.0, "N", "O", t),
    ]
    d = str(tmp_path / "mini")
    spark.createDataFrame(rows, LINEITEM).write.parquet(
        f"{d}/lineitem.parquet"
    )
    out = {r.abc_class: r for r in QUERIES["abc_inventory_classes"](spark, d).collect()}
    assert set(out) == {"A", "B", "C"}
    assert (out["A"].n_parts, out["A"].revenue_cents, out["A"].revenue_share_bp) == (1, 850, 8500)
    assert (out["B"].n_parts, out["B"].revenue_cents, out["B"].revenue_share_bp) == (1, 100, 1000)
    assert (out["C"].n_parts, out["C"].revenue_cents, out["C"].revenue_share_bp) == (2, 50, 500)


def test_key_uniqueness_flags_planted_duplicate(spark, tmp_path):
    """Copy the sf0.001 schema and append an exact duplicate of one
    event row: events.event_id must report n_excess_rows=1 /
    is_unique=False. The audit also (correctly) reports that the
    SYNTHETIC generator does not enforce lineitem's composite key —
    a real data finding, asserted as such; every other key is
    unique."""
    from logicash_etl_spark.queries import QUERIES

    src = "/root/testdata/sf0.001"
    d = str(tmp_path / "mini")
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "documents"]:
        spark.read.parquet(f"{src}/{t}.parquet").write.parquet(
            f"{d}/{t}.parquet"
        )
    ev = spark.read.parquet(f"{src}/events.parquet")
    ev.unionByName(ev.limit(1)).write.parquet(f"{d}/events.parquet")
    out = {r.table_key: r for r in QUERIES["key_uniqueness_audit"](spark, d).collect()}
    assert len(out) == 9
    e = out["events.event_id"]
    assert e.n_excess_rows == 1 and e.is_unique is False
    assert e.n_rows == e.n_distinct + 1
    li = out["lineitem.(l_orderkey,l_linenumber)"]
    assert li.is_unique is False and li.n_excess_rows > 0
    for k, r in out.items():
        if k not in ("events.event_id", "lineitem.(l_orderkey,l_linenumber)"):
            assert r.is_unique is True and r.n_excess_rows == 0, k


def test_backlog_aging_closed_bucket_bounds(spark, tmp_path):
    """Orders at exactly 0/30/31/365/366 days before the newest
    order: the closed bounds put day 30 in '0-30d', day 31 in
    '31-90d', day 365 in '91-365d', day 366 in '366d+'."""
    import datetime as dt

    from logicash_etl_spark.queries import QUERIES
    from logicash_etl_spark.schemas import ORDERS

    a = dt.datetime(2024, 12, 31)
    mk = lambda k, days, st: (k, k, st, 1.0, a - dt.timedelta(days=days), "1")  # noqa: E731
    rows = [
        mk(1, 0, "O"), mk(2, 30, "O"), mk(3, 31, "O"),
        mk(4, 365, "F"), mk(5, 366, "F"),
    ]
    d = str(tmp_path / "mini")
    spark.createDataFrame(rows, ORDERS).write.parquet(f"{d}/orders.parquet")
    out = {(r.status, r.age_bucket): r.n_orders
           for r in QUERIES["order_backlog_aging"](spark, d).collect()}
    assert out == {
        ("O", "0-30d"): 2,
        ("O", "31-90d"): 1,
        ("F", "91-365d"): 1,
        ("F", "366d+"): 1,
    }


def test_srm_detects_the_all_even_split(spark, tmp_path):
    """Users 2,4,6,8 land 4-0 under parity: chi2 = 16/4 = 4.0 >
    3.841459 -> SRM detected at exactly-integer ppm (4000000). The
    md5 row must match an independent hashlib reference."""
    import datetime as dt
    import hashlib

    from logicash_etl_spark.queries import QUERIES
    from logicash_etl_spark.schemas import EVENTS

    t0 = dt.datetime(2024, 1, 1)
    ids = [2, 4, 6, 8]
    rows = [(i, t0, u, "view", 0.0, "{}") for i, u in enumerate(ids, 1)]
    d = str(tmp_path / "mini")
    spark.createDataFrame(rows, EVENTS).write.parquet(f"{d}/events.parquet")
    out = {r.assignment: r for r in QUERIES["srm_check"](spark, d).collect()}
    p = out["parity"]
    assert (p.n_a, p.n_b, p.chi2_ppm, p.srm_detected) == (4, 0, 4000000, True)
    m = out["md5"]
    exp_a = sum(
        1 for u in ids
        if int(hashlib.md5(str(u).encode()).hexdigest()[:8], 16) % 2 == 0
    )
    assert (m.n_a, m.n_b) == (exp_a, 4 - exp_a)
