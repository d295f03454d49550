"""Differential tests: every registered query with an oracle must match
DuckDB exactly at sf0.01 — the same check the driver runs."""

from __future__ import annotations

import pytest

from logicash_etl_spark.queries import ORACLES, QUERIES
from tests.oracle_utils import compare


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    compare(df, ORACLES[name], sf_dir)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only(spark, sf_dir, name):
    """Non-SQL-expressible ops: at least run and produce a stable schema."""
    df = QUERIES[name](spark, sf_dir)
    assert df.columns
    assert df.count() >= 0
