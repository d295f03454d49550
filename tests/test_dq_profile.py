"""Direct tests for dq/profile.py: one-pass profiler, value_counts,
range audit."""

from __future__ import annotations

from pyspark.sql import functions as F

from logicash_etl_spark.dq.profile import profile, range_audit, value_counts
from logicash_etl_spark.sources.readers import read_table


def test_profile_one_row_metrics(spark, sf_dir):
    o = read_table(spark, sf_dir, "orders")
    row = profile(o, exact_distinct=True).collect()[0]
    assert row.total_rows == o.count()
    assert row.o_orderkey_distinct == o.count()  # PK
    assert row.o_orderstatus_distinct == 3
    assert row.o_custkey_nulls == 0
    assert row.o_totalprice_min > 0
    assert row.o_totalprice_min <= row.o_totalprice_median <= row.o_totalprice_max


def test_profile_approx_close_to_exact(spark, sf_dir):
    o = read_table(spark, sf_dir, "orders")
    approx = profile(o).collect()[0]
    exact = profile(o, exact_distinct=True).collect()[0]
    rel = abs(approx.o_orderkey_distinct - exact.o_orderkey_distinct) / exact.o_orderkey_distinct
    assert rel < 0.1


def test_value_counts_top(spark, sf_dir):
    o = read_table(spark, sf_dir, "orders")
    vc = value_counts(o, "o_orderpriority", top=3).collect()
    assert len(vc) == 3
    assert vc[0].n >= vc[1].n >= vc[2].n
    full = dict(
        (r.o_orderpriority, r.n)
        for r in o.groupBy("o_orderpriority").agg(F.count("*").alias("n")).collect()
    )
    assert vc[0].n == max(full.values())


def test_range_audit(spark, sf_dir):
    li = read_table(spark, sf_dir, "lineitem")
    row = range_audit(li, "l_quantity").collect()[0]
    assert row.total_rows == li.count()
    assert row.l_quantity_non_positive == 0
    assert row.l_quantity_min <= row.l_quantity_avg <= row.l_quantity_max
