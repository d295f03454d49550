"""Round-10 pinning tests: the advisor findings are fixed ON THE
PATHOLOGICAL CORPUS, not just documented — each test builds the dirty
fixture the finding described and proves Spark and DuckDB now agree
through the driver-identical comparator.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from logicash_etl_spark.queries import ORACLES, QUERIES
from tests.oracle_utils import TABLES, compare

SF = "/root/testdata/sf0.001"


def _copy_tables(dst: str, overrides: dict[str, str]) -> None:
    """Copy the sf0.001 fixture tables to ``dst`` via DuckDB COPY,
    substituting the SELECT in ``overrides`` for that table (FROM t is
    the source view). Both engines then read the same dirty files."""
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW t_{t} AS SELECT * FROM "
            f"read_parquet('{SF}/{t}.parquet')"
        )
        if t in overrides:
            sel = overrides[t].replace(" FROM t", f" FROM t_{t}")
        else:
            sel = f"SELECT * FROM t_{t}"
        con.execute(
            f"COPY ({sel}) TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
        )
    con.close()


@pytest.fixture(scope="module")
def dup_parent_dir(tmp_path_factory):
    """A corpus where one customer PK is duplicated — the join-fanout
    pathology key_uniqueness_audit exists to detect."""
    d = str(tmp_path_factory.mktemp("dirty_dup_parent"))
    _copy_tables(
        d,
        {
            # parenthesized arm: appends exactly one duplicate of the
            # lowest custkey (without parens ORDER/LIMIT would apply
            # to the whole union)
            "customer": (
                "SELECT * FROM t UNION ALL "
                "(SELECT * FROM t ORDER BY c_custkey LIMIT 1)"
            )
        },
    )
    return d


def test_referential_integrity_no_fanout_on_dup_parent(spark, dup_parent_dir):
    """r9 ADVICE #1: with a duplicated parent PK, the raw-parent
    oracle used to inflate n_child_rows via join fanout while Spark's
    .distinct() did not. Both sides now dedup the parent — the
    comparator must pass on the dirty corpus, and the orders edge's
    child count must equal count(orders) exactly (existence
    semantics, not parent multiplicity)."""
    name = "referential_integrity_audit"
    df = QUERIES[name](spark, dup_parent_dir)
    compare(df, ORACLES[name], dup_parent_dir)

    con = duckdb.connect()
    n_orders = con.execute(
        f"SELECT count(*) FROM read_parquet('{dup_parent_dir}/orders.parquet')"
    ).fetchone()[0]
    con.close()
    row = {
        r["fk_edge"]: r["n_child_rows"]
        for r in (x.asDict() for x in df.collect())
    }
    assert row["orders.o_custkey -> customer"] == n_orders
    spark.catalog.clearCache()


@pytest.fixture(scope="module")
def refund_dir(tmp_path_factory):
    """A corpus with refunds: every 7th purchase event's value is
    negated — exercises the GREATEST(cents, 0) refund contract on
    conversions with negative value."""
    d = str(tmp_path_factory.mktemp("dirty_refunds"))
    _copy_tables(
        d,
        {
            "events": (
                "SELECT event_id, ts, user_id, event_type, "
                "CASE WHEN event_type = 'purchase' AND event_id % 7 = 0 "
                "THEN -value ELSE value END AS value, props FROM t"
            )
        },
    )
    return d


def test_multi_touch_attribution_refund_corpus(spark, refund_dir):
    """r9 ADVICE #3 follow-through: the round-10 primitive audit
    showed Spark `div` and DuckDB `//` actually AGREE on negative
    BIGINTs (see test_integer_div_mod_primitives_match_duckdb), so
    the advisor's divergence premise was false — but the clamp stands
    as the better CONTRACT: refunds attribute zero credit instead of
    negative microcent splits, applied identically in both engines.
    The comparator must pass on the refund corpus and every
    linear_microcents stays non-negative."""
    name = "multi_touch_attribution"
    df = QUERIES[name](spark, refund_dir)
    compare(df, ORACLES[name], refund_dir)
    assert all(r.linear_microcents >= 0 for r in df.collect())
    spark.catalog.clearCache()


def test_hll_partial_merge_single_fact_scan(spark, sf_dir):
    """r10 scan-audit fix: the (source, fingerprint) frame and the
    per-source sketch partials are persisted, so the plan reads the
    documents fact exactly once (was 3)."""
    from logicash_etl_spark.plans.inspect import scans

    df = QUERIES["hll_partial_merge_counts"](spark, sf_dir)
    doc_scans = [s for s in scans(df) if "documents" in s["location"]]
    assert len(doc_scans) == 1, doc_scans
    spark.catalog.clearCache()


def test_scan_audit_sys_path_is_dirname():
    """r9 ADVICE #4: the sys.path insert must be the repo dir, never
    the filename itself."""
    import re

    src = open(
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "scan_audit.py")
    ).read()
    assert "os.path.dirname(os.path.abspath(__file__))" in src
    assert not re.search(r"__file__\.rsplit", src)


def test_integer_div_mod_primitives_match_duckdb(spark):
    """r10 negative-money audit conclusion, pinned at the PRIMITIVE
    level: Spark `div`/`%` and DuckDB `//`/`%` agree on BIGINT for
    ALL signs (both truncate toward zero; remainder takes the
    dividend's sign). The r9 advisor premise — that they diverge on
    negatives — is FALSE for integer operands in this pair. CAVEAT
    that keeps this test load-bearing: DuckDB 1.0.0 `//` on DOUBLE
    is NOT integer division at all (-7.0 // 2 = -3.5), so oracle
    `//` must only ever ride on integer operands — which every
    oracle does via explicit BIGINT cents/counts. Grid: signed
    dividends x signed divisors, plus int64-scale magnitudes."""
    import duckdb

    pairs = [
        (a, b)
        for a in [-9, -7, -4, -1, 0, 1, 4, 7, 9, 10**17, -(10**17)]
        for b in [-9, -3, -2, -1, 1, 2, 3, 9, 10**9]
    ]
    con = duckdb.connect()
    duck = [
        con.execute(
            f"SELECT CAST({a} AS BIGINT) // CAST({b} AS BIGINT), "
            f"CAST({a} AS BIGINT) % CAST({b} AS BIGINT)"
        ).fetchone()
        for a, b in pairs
    ]
    con.close()
    rows = spark.createDataFrame(pairs, "a long, b long").selectExpr(
        "a div b AS d", "a % b AS m"
    ).collect()
    got = [(r.d, r.m) for r in rows]
    assert got == [tuple(x) for x in duck]


def test_key_uniqueness_audit_reports_dup_parent(spark, dup_parent_dir):
    """The audit-then-operate contract's other half: on the same
    duplicated-parent corpus, key_uniqueness_audit must stay
    oracle-green AND report customer.c_custkey as non-unique with
    exactly one excess row — the gate that tells a pipeline the
    [requires-pk] operators (see corpus_robustness_check KNOWN_DUPPK)
    are not safe to run yet."""
    name = "key_uniqueness_audit"
    df = QUERIES[name](spark, dup_parent_dir)
    compare(df, ORACLES[name], dup_parent_dir)
    rows = {r.table_key: r for r in df.collect()}
    cust = rows["customer.c_custkey"]
    assert not cust.is_unique
    assert cust.n_excess_rows == 1
    # lineitem's composite key is non-unique ON THE FIXTURE ITSELF —
    # a real generator property the audit surfaced in round 9 (1,401
    # excess rows at sf0.001, pinned in its unit test) — so it is
    # excluded here alongside the key this test deliberately broke
    assert all(
        r.is_unique
        for k, r in rows.items()
        if k not in ("customer.c_custkey",
                     "lineitem.(l_orderkey,l_linenumber)")
    )
    spark.catalog.clearCache()
