"""Round-14 optimization equivalence pins.

Each test pins an optimization that changed an operator's internals
this round: the optimized path must decide/produce EXACTLY what the
retired (or bypassed) path did.
"""

from __future__ import annotations

import os
import shutil

import pytest

from logicash_etl_spark.sources.lot_datasource import (
    lot_stream_quiet,
    register_lot_source,
)


def _drain(spark, root, ck, out):
    q = (
        spark.readStream.format("logicash_lot")
        .schema("id long")
        .option("path", root)
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_lot_stream_quiet_mirrors_reader_decision(spark, tmp_path):
    """The quiet-period detector must say True exactly when a stream
    restart would plan one empty no-new-lots micro-batch, and False on
    every divergence the real reader acts on (new lot, mutated stamp,
    vanished consumed lot, uncommitted batch) — so the fast path can
    never skip a drain or mask a contract violation."""
    register_lot_source(spark)
    root = str(tmp_path / "lots")
    ck, out = str(tmp_path / "ck"), str(tmp_path / "out")
    spark.range(5).write.format("logicash_lot").mode("append").option(
        "path", f"{root}/lot_a"
    ).save()

    # before any drain: no checkpoint logs -> not quiet
    assert not lot_stream_quiet(ck, root)

    _drain(spark, root, ck, out)
    assert lot_stream_quiet(ck, root)

    # a new READY lot is new data -> not quiet; the stream picks it up
    # and the detector flips back to quiet afterwards
    spark.range(5, 8).write.format("logicash_lot").mode("append").option(
        "path", f"{root}/lot_b"
    ).save()
    assert not lot_stream_quiet(ck, root)
    _drain(spark, root, ck, out)
    assert lot_stream_quiet(ck, root)
    got = sorted(r.id for r in spark.read.parquet(out).collect())
    assert got == list(range(8))

    # mutated consumed lot (stamp changed) -> not quiet (stream raises)
    flag = f"{root}/lot_a/_READY"
    stamp = open(flag).read()
    with open(flag, "w") as fh:
        fh.write("rows=999 gen=deadbeef")
    assert not lot_stream_quiet(ck, root)
    with open(flag, "w") as fh:
        fh.write(stamp)
    # restoring bytes does NOT restore the stamp: mtime_ns moved
    assert not lot_stream_quiet(ck, root)

    # vanished consumed lot -> not quiet (stream raises)
    saved = str(tmp_path / "saved_lot_b")
    shutil.move(f"{root}/lot_b", saved)
    assert not lot_stream_quiet(ck, root)
    shutil.move(saved, f"{root}/lot_b")

    # uncommitted latest batch (crash between offset write and commit)
    # -> not quiet (the restart must replay the batch)
    commits = sorted(
        f for f in os.listdir(f"{ck}/commits") if f.lstrip("-").isdigit()
    )
    latest = f"{ck}/commits/{commits[-1]}"
    saved_commit = str(tmp_path / "saved_commit")
    shutil.move(latest, saved_commit)
    assert not lot_stream_quiet(ck, root)
    shutil.move(saved_commit, latest)


def test_grouped_prefix_peak_matches_prefix_sum_then_max(spark):
    """grouped_prefix_peak must equal grouped_prefix_sum(inclusive)
    followed by groupBy(max) on every group — including negative
    deltas (the sweep-line's -1 boundaries), ties on the bucket key,
    NULL values (skipped by both forms), single-row groups, and a
    bucket count smaller than the group's distinct keys."""
    from pyspark.sql import functions as F

    from logicash_etl_spark.operators.partitioning import (
        grouped_prefix_peak,
        grouped_prefix_sum,
    )

    import random

    rnd = random.Random(14)
    rows = []
    tie = 0
    for g in ("a", "b", "c", "single"):
        n = 1 if g == "single" else 200
        for i in range(n):
            rows.append(
                (
                    g,
                    rnd.randrange(0, 50),  # bucket key with many ties
                    rnd.choice([None, -3, -1, -1, 1, 1, 2, 5]),
                    tie,  # deterministic tiebreak, assigned in Python
                )
            )
            tie += 1
    df = spark.createDataFrame(rows, "g string, k int, v int, __tie long")
    order = [F.col("k").asc(), F.col("__tie").asc()]
    expected = (
        grouped_prefix_sum(
            df, "g", "k", order, "v", out_col="__c", buckets=8, inclusive=True
        )
        .groupBy("g")
        .agg(F.max("__c").alias("peak"))
    )
    got = grouped_prefix_peak(
        df, "g", "k", order, "v", out_col="peak", buckets=8
    )
    exp = {r["g"]: r["peak"] for r in expected.collect()}
    act = {r["g"]: r["peak"] for r in got.collect()}
    assert act == exp


def test_streaming_incremental_dedup_warm_fastpath_identical(spark, sf_smoke):
    """The warm quiet-period fast path (sink readback without a stream
    restart) must return byte-identical verdicts to the cold drain —
    and a second warm call must stay identical too (the memoized drain
    state is not consumed by the fast path)."""
    from logicash_etl_spark.queries import QUERIES
    from logicash_etl_spark.queries import streaming as _sq

    # fresh drain state for this test regardless of what ran before
    _sq._DRAIN_MEMO.pop(("incremental_dedup", os.path.abspath(sf_smoke)), None)
    cold = sorted(
        map(tuple, QUERIES["streaming_incremental_dedup"](spark, sf_smoke).collect())
    )
    state = _sq._drain_state("incremental_dedup", sf_smoke, "lq_inc_stream_")
    assert state["cold"] is False  # second _drain_state call is warm
    assert lot_stream_quiet(f"{state['root']}/ckpt", f"{state['root']}/lots")
    warm1 = sorted(
        map(tuple, QUERIES["streaming_incremental_dedup"](spark, sf_smoke).collect())
    )
    warm2 = sorted(
        map(tuple, QUERIES["streaming_incremental_dedup"](spark, sf_smoke).collect())
    )
    assert warm1 == cold
    assert warm2 == cold


def test_kmv_membership_flags_match_filter_distinct_join(spark):
    """kmv_set_overlap's one-scan membership-flag frame must decide
    set a, set b, and the three exact counts exactly as the retired
    two-scan filter+distinct shape and its a-join-b intersection —
    including NULL order keys (never join-matched, but counted in the
    per-set counts, as count(*) over a DISTINCT set counts its NULL
    row), orders whose lines match both / one / neither filter, and
    an input matching nothing (sum-over-empty must still report 0)."""
    from pyspark.sql import functions as F

    rows = [
        (1, "R", 10.0),  # order 1: set a via this line ...
        (1, "N", 45.0),  # ... set b via this one -> in the intersection
        (2, "R", 50.0),  # both sets via a single line
        (3, "N", 41.0),  # b only
        (4, "R", 5.0),   # a only
        (5, "N", 1.0),   # neither
        (None, "R", 99.0),  # NULL key lands in both sets' counts ...
        (None, "N", 44.0),  # ... but never in the join intersection
    ]
    li = spark.createDataFrame(
        rows, "l_orderkey long, l_returnflag string, l_quantity double"
    )
    pa = F.col("l_returnflag") == "R"
    pb = F.col("l_quantity") >= 40

    def old_shape(src):
        a = src.filter(pa).select(F.col("l_orderkey").alias("v")).distinct()
        b = src.filter(pb).select(F.col("l_orderkey").alias("v")).distinct()
        return (
            {r.v for r in a.collect()},
            {r.v for r in b.collect()},
            a.count(),
            b.count(),
            a.join(b, "v").count(),
        )

    def new_shape(src):
        base = (
            src.filter(pa | pb)
            .select(
                F.col("l_orderkey").alias("v"), pa.alias("pa"), pb.alias("pb")
            )
            .groupBy("v")
            .agg(F.max("pa").alias("in_a"), F.max("pb").alias("in_b"))
        )
        ex = base.agg(
            F.coalesce(F.sum(F.col("in_a").cast("long")), F.lit(0))
            .cast("bigint")
            .alias("exact_a"),
            F.coalesce(F.sum(F.col("in_b").cast("long")), F.lit(0))
            .cast("bigint")
            .alias("exact_b"),
            F.coalesce(
                F.sum(
                    (
                        F.col("in_a") & F.col("in_b") & F.col("v").isNotNull()
                    ).cast("long")
                ),
                F.lit(0),
            )
            .cast("bigint")
            .alias("exact_inter"),
        ).collect()[0]
        return (
            {r.v for r in base.filter(F.col("in_a")).select("v").collect()},
            {r.v for r in base.filter(F.col("in_b")).select("v").collect()},
            ex.exact_a,
            ex.exact_b,
            ex.exact_inter,
        )

    assert new_shape(li) == old_shape(li)
    assert old_shape(li)[4] == 2  # the fixture exercises a real overlap

    empty_match = li.filter(F.col("l_quantity") < 0)
    assert new_shape(empty_match) == old_shape(empty_match)
    assert new_shape(empty_match)[2:] == (0, 0, 0)
