"""Physical-plan regression tests: lock in the plan shapes SCALE.md claims
(pushdown, broadcast joins, partial aggregation, single-exchange windows).
A correctness-preserving change that silently degrades one of these is a
scale regression even though every value still matches."""

from __future__ import annotations

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    df = entry.queries()[name](spark, SF)
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown_and_pruning(spark):
    plan = _plan(spark, "customer_filter_segment")
    assert "PushedFilters: [IsNotNull(c_mktsegment), EqualTo(c_mktsegment,BUILDING)]" in plan
    assert "ReadSchema: struct<c_custkey:bigint,c_name:string,c_mktsegment:string>" in plan


def test_dim_joins_mixed_strategy(spark):
    # part/supplier are true dims (broadcast); orders is fact-scale and must
    # NOT be broadcast — it takes a co-partitioned sort-merge join, the only
    # shape that survives a 100x scale-up of both fact tables.
    plan = _plan(spark, "fact_enrichment_join")
    assert plan.count("BroadcastHashJoin") == 2
    assert plan.count("SortMergeJoin") == 1
    # the true-dim joins never shuffle the fact side
    assert "Exchange hashpartitioning(l_partkey" not in plan
    assert "Exchange hashpartitioning(l_suppkey" not in plan


def test_merge_split_insert_plan(spark):
    # A MERGE with an INSERT clause and a broadcastable source must never run
    # a full-outer join (not broadcastable — both sides would shuffle full
    # rows).  The engine splits it: matched/update path keeps the broadcast
    # left-outer (target streams map-side), and inserts come from a LEFT ANTI
    # join whose target side Catalyst prunes to the ON columns — the only
    # shuffle of target data at scale moves key columns, not rows.
    import re

    plan = _plan(spark, "scd1_customer_dim")
    assert "FullOuter" not in plan
    assert plan.count("LeftAnti") == 1
    assert "LeftOuter" in plan and "BroadcastHashJoin" in plan
    # the anti-join's target scan reads only the merge key
    assert re.search(r"FileScan parquet \[c_custkey#\d+L?\]", plan)


def test_aggregate_is_partial_plus_final(spark):
    plan = _plan(spark, "lineitem_pricing_summary")
    assert plan.count("HashAggregate") >= 2      # partial + final
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan


def test_shared_window_spec_single_exchange(spark):
    """The plain shared-spec path (no shards): one shuffle and one sort
    serve all three rank functions."""
    from medallion_data_warehouse_on_azure_with_databricks_pyspark_spark.operators import (
        silver, windows,
    )

    df = spark.read.parquet(f"{SF}/orders.parquet")
    df = silver.derive_year(df, "o_orderdate", out="order_year")
    out = windows.ranked_all(
        df, ["order_year"], [("o_totalprice", True), ("o_orderkey", False)],
        prefix="price_",
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("Window") == 1


def test_year_windows_lane_adapts_sharding_to_key_heat(spark):
    """r13 routed the lane through the skew-sharded rank path; r14 made
    the routing ADAPTIVE (hot_threshold + a bounded hot-key probe): at
    test scale no year is hot, so the lane's plan must be the PLAIN
    single-window one — no __shard machinery, no joins of data-sized
    rows — while a planted whale year (beyond the threshold) brings the
    (year, __shard) sharded plan back.  The whale geometry itself is
    pinned in tests/test_skew.py; here we pin the lane-level plan
    switch."""
    from pyspark.sql import functions as F

    from medallion_data_warehouse_on_azure_with_databricks_pyspark_spark.operators import (
        windows,
    )

    plan = _plan(spark, "orders_year_windows")
    assert "__shard" not in plan  # cold keys: plain window, probe only
    assert "Window" in plan
    # the sharded plan engages the moment a key crosses the threshold
    df = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .withColumn("order_year", F.year("o_orderdate"))
    )
    hot = windows.ranked_all(
        df, ["order_year"], [("o_totalprice", True), ("o_orderkey", False)],
        prefix="price_", shards=8, hot_threshold=10,
    )
    hot_plan = hot._jdf.queryExecution().executedPlan().toString()
    assert "__shard" in hot_plan
    assert "SortMergeJoin" not in hot_plan  # stitch offsets broadcast


def test_topk_avoids_global_sort(spark):
    plan = _plan(spark, "orders_top20")
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan


def test_narrow_input_parallelized(spark):
    from medallion_data_warehouse_on_azure_with_databricks_pyspark_spark.operators import (
        dedup,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    target = spark.sparkContext.defaultParallelism
    sh = dedup.shingle_frame(docs, "doc_id", "text", 3)
    assert sh.rdd.getNumPartitions() >= min(target, 4)


def test_analytic_window_pack_single_window_node(spark):
    plan = _plan(spark, "orders_analytic_windows")
    # five window functions, one shared spec: one exchange, one sort, one
    # Window node (a second Window would mean a second sort of the fact)
    assert plan.count("Window") == 1
    assert plan.count("Exchange") == 1


def test_anti_join_prunes_probe_side(spark):
    plan = _plan(spark, "customer_without_orders")
    assert "LeftAnti" in plan
    # the orders scan feeding the anti join reads only the key + predicate
    # columns, and the price filter is pushed to parquet
    assert "ReadSchema: struct<o_custkey:bigint,o_totalprice:double>" in plan
    assert "GreaterThan(o_totalprice,450000.0)" in plan


def test_vocab_topk_avoids_unpartitioned_window(spark):
    # top-50 vocabulary selection must lower to TakeOrderedAndProject
    # (per-partition heaps), never an unpartitioned rank window that drags
    # the whole |vocab|-sized aggregate through one task.
    plan = _plan(spark, "corpus_vocab_topk")
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan
    assert "Exchange rangepartitioning" not in plan


def test_cube_is_single_partial_aggregated_pass(spark):
    plan = _plan(spark, "orders_status_priority_cube")
    assert "Expand" in plan                      # grouping-set expansion map-side
    assert plan.count("Exchange") == 1           # one shuffle for all lattices
    assert plan.count("HashAggregate") >= 2      # partial + final


def test_winnow_and_span_queries_avoid_cartesian(spark):
    # Pair generation MUST go through the fingerprint/gram inverted-index
    # equi-joins — a nested-loop or cartesian anywhere means the all-pairs
    # shape the operators exist to avoid.
    for q in ("doc_winnow_overlap_pairs", "doc_duplicated_spans",
              "doc_duplication_stats"):
        plan = _plan(spark, q)
        assert "CartesianProduct" not in plan, q
        assert "BroadcastNestedLoopJoin" not in plan, q


def test_source_caps_avoid_row_number_window(spark):
    # The per-group cap must lower to the two-phase k-heap partial
    # aggregate (exchange carries groups x cap candidates), never a
    # row_number window that shuffles every corpus row to rank it.
    plan = _plan(spark, "doc_source_caps")
    assert "Window" not in plan
    assert "HashAggregate" in plan               # partial+final k-heap


def test_ivf_indexed_probe_prunes_partitions(spark):
    # The indexed ANN probe's lists scan must carry a pivot_id partition
    # filter — un-probed inverted lists contribute zero scan tasks.
    plan = _plan(spark, "emb_ivf_indexed_topk")
    assert "PartitionFilters: [pivot_id" in plan


def test_shipping_priority_plan_shape(spark):
    """Q3 shape: segment filter reaches the customer scan, the filtered
    customer set broadcasts into orders, and the top-10 is
    TakeOrderedAndProject — never a global Sort of the aggregate."""
    plan = _plan(spark, "orders_shipping_priority")
    assert "PushedFilters: [IsNotNull(c_mktsegment), EqualTo(c_mktsegment,BUILDING)" in plan
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan


def test_regional_revenue_dim_chain_broadcasts(spark):
    """Q5 shape: the region→nation→supplier chain rides broadcasts (the
    region filter is pushed to its scan); lineitem is never broadcast and
    never cartesian-joined."""
    plan = _plan(spark, "regional_nation_revenue")
    assert "PushedFilters: [IsNotNull(r_name), EqualTo(r_name,ASIA)" in plan
    assert plan.count("BroadcastHashJoin") >= 3
    assert "CartesianProduct" not in plan


def test_bucketed_colocated_join_lane_no_join_exchange(spark):
    """The registered bucket-join lane must run its SortMergeJoin with no
    Exchange on either side (the bucket layout satisfies the join's
    distribution); the only exchange is the final per-segment aggregate."""
    plan = _plan(spark, "orders_bucketed_colocated_join")
    assert "SortMergeJoin" in plan
    assert "Exchange hashpartitioning(o_custkey" not in plan
    assert "Exchange hashpartitioning(c_custkey" not in plan
