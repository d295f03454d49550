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
    negated — the numerator sign that splits Spark truncating `div`
    from DuckDB flooring `//`."""
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
    """r9 ADVICE #3: on a corpus with negative conversion values the
    unclamped integer split diverged between engines (floor vs
    truncate). With GREATEST(cents, 0) in both, the comparator must
    pass on the refund corpus — and refunds contribute zero credit,
    so every linear_microcents stays non-negative."""
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
