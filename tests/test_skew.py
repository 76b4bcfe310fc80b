"""Skew-mitigation operators: salting must be semantically invisible."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from medallion_data_warehouse_on_azure_with_databricks_pyspark_spark.operators import (
    skew,
)

SF = "/root/testdata/sf0.001"


def test_salted_group_agg_equals_direct(spark):
    df = spark.read.parquet(f"{SF}/lineitem.parquet")
    salted = skew.salted_group_agg(
        df,
        ["l_returnflag"],
        [
            ("sum_qty", F.col("l_quantity").cast("decimal(18,2)"), "sum"),
            ("n", "l_orderkey", "count"),
            ("min_ship", "l_shipdate", "min"),
            ("max_ship", "l_shipdate", "max"),
        ],
        salt_from="l_orderkey",
        buckets=7,
    )
    direct = df.groupBy("l_returnflag").agg(
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("sum_qty"),
        F.count("l_orderkey").alias("n"),
        F.min("l_shipdate").alias("min_ship"),
        F.max("l_shipdate").alias("max_ship"),
    )
    key = lambda rows: sorted(tuple(r) for r in rows)  # noqa: E731
    assert key(salted.collect()) == key(direct.collect())


def test_salted_group_agg_rejects_non_algebraic(spark):
    df = spark.range(10)
    try:
        skew.salted_group_agg(df, ["id"], [("a", "id", "avg")], salt_from="id")
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_salted_join_equals_plain_join(spark):
    lineitem = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    part = spark.read.parquet(f"{SF}/part.parquet").select(
        F.col("p_partkey").alias("l_partkey"), "p_name"
    )
    salted = skew.salted_join(
        lineitem, part, "l_partkey", salt_from="l_orderkey", buckets=5
    )
    plain = lineitem.join(part, "l_partkey")
    assert salted.count() == plain.count()
    key = lambda df: sorted(  # noqa: E731
        tuple(r) for r in df.select("l_partkey", "l_orderkey", "p_name").collect()
    )
    assert key(salted) == key(plain)
    # left join parity incl. unmatched rows
    some = part.filter(F.col("l_partkey") % 2 == 0)
    s = skew.salted_join(lineitem, some, "l_partkey", "l_orderkey", 3, how="left")
    p = lineitem.join(some, "l_partkey", "left")
    assert s.count() == p.count()


def test_scd2_merge_hot_key_bounded_by_latest_pick(spark):
    """SCD2 at skewed scale (§2.8): a CDC batch carrying 10⁵ updates for
    ONE product key must (a) collapse to one row per key BEFORE any
    merge join — the W5 latest-pick is the mitigation, so no join task
    ever sees the hot key's full update volume, only the per-key window
    sort does (its inherent cost, bounded by per-key batch volume) —
    and (b) produce the correct dimension: exactly one expired row and
    one new current row for the hot key, untouched rows for cold keys.
    See SCALE.md "SCD2 under hot-key CDC"."""
    from medallion_data_warehouse_on_azure_with_databricks_pyspark_spark.operators import (
        windows,
    )
    from medallion_data_warehouse_on_azure_with_databricks_pyspark_spark.plans import (
        scd,
    )

    n_hot = 100_000
    hot = spark.range(n_hot).select(
        F.lit(1).alias("product_id"),
        F.col("id").alias("seq"),
        F.concat(F.lit("v"), F.col("id")).alias("name"),
    )
    cold = spark.range(2, 52).select(
        F.col("id").alias("product_id"),
        F.lit(0).cast("long").alias("seq"),
        F.concat(F.lit("cold"), F.col("id")).alias("name"),
    )
    source = hot.unionByName(cold)

    # (a) the pick bounds the merge input to one row per key — the joins
    # downstream of it can never concentrate more than one hot-key row
    # in a task
    latest = windows.latest_per_key(source, ["product_id"], "seq")
    assert latest.count() == 51
    got = latest.filter(F.col("product_id") == 1).collect()
    assert len(got) == 1 and got[0]["name"] == f"v{n_hot - 1}"

    # (b) end-to-end through apply_changes against a standing dimension
    target = scd.scd2_initial(
        spark.createDataFrame(
            [(1, "orig"), (2, "cold2")], "product_id long, name string"
        ),
        keys=["product_id"],
        attrs=["name"],
        now="2024-01-01 00:00:00",
    )
    state = scd.apply_changes(
        target=target,
        source=source,
        keys=["product_id"],
        sequence_by="seq",
        stored_as_scd_type=2,
        now="2024-06-01 00:00:00",
    )
    rows = state.filter(F.col("product_id") == 1).collect()
    by_current = {r["is_current"]: r for r in rows}
    assert len(rows) == 2
    assert by_current[True]["name"] == f"v{n_hot - 1}"
    assert by_current[False]["name"] == "orig"
    # key 2's batch value equals its standing value -> untouched; keys
    # 3..51 are brand-new inserts; only the hot key expired a row
    assert state.filter(~F.col("is_current")).count() == 1
    assert state.filter(F.col("is_current")).count() == 51


# ---------------------------------------------------------------------------
# Hot-key sub-sharding for bounded trailing windows (round 12)
# ---------------------------------------------------------------------------

def _hotkey_df(spark):
    """One whale key (2000 rows) + two normal keys (40 rows each), values
    with a few planted spikes so the anomaly flag set is non-trivial."""
    rows = []
    for i in range(2000):
        v = 10.0 + (i % 7) * 0.25 + (200.0 if i % 403 == 0 and i else 0.0)
        rows.append(("whale", i, i, v))
    for k in ("a", "b"):
        for i in range(40):
            v = 5.0 + (i % 5) * 0.5 + (100.0 if i == 33 else 0.0)
            rows.append((k, 10_000 + i, 10_000 + i, v))
    return spark.createDataFrame(
        rows, "event_type string, ts long, event_id long, value double"
    )


def test_sub_sharded_window_equals_plain_window(spark):
    from pyspark.sql import Window

    from medallion_data_warehouse_on_azure_with_databricks_pyspark_spark.operators.skew import (
        sub_sharded_bounded_window,
    )

    df = _hotkey_df(spark).withColumn(
        "__v", F.floor(F.col("value") * 1000).cast("long")
    )
    exprs = {
        "n": lambda w: F.count("__v").over(w),
        "s1": lambda w: F.sum("__v").over(w),
        "s2": lambda w: F.sum(F.col("__v") * F.col("__v")).over(w),
    }
    lookback = 20
    plain_w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(-lookback, -1)
    )
    plain = df
    for name, fn in exprs.items():
        plain = plain.withColumn(name, fn(plain_w))
    # mixed population: only the whale crosses hot_threshold and shards;
    # the 40-row keys keep their single-shard plain window in-pass
    sharded = sub_sharded_bounded_window(
        df, "event_type", "ts", "event_id", lookback, exprs, shards=8,
        hot_threshold=2 * 8 * lookback,
    )
    cols = ["event_type", "event_id", "n", "s1", "s2"]
    want = sorted(map(tuple, plain.select(*cols).collect()))
    got = sorted(map(tuple, sharded.select(*cols).collect()))
    assert got == want  # bit-identical, every row, seams included


def test_sub_sharded_window_plan_partitions_by_shard(spark):
    from medallion_data_warehouse_on_azure_with_databricks_pyspark_spark.operators.skew import (
        sub_sharded_bounded_window,
    )

    df = _hotkey_df(spark).filter("event_type = 'whale'")
    out = sub_sharded_bounded_window(
        df, "event_type", "ts", "event_id", 20,
        {"n": lambda w: F.count("value").over(w)}, shards=8,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the window's partition spec carries (key, __shard): the hot key's
    # rows spread across `shards` tasks instead of serializing on one
    win_lines = [
        line for line in plan.splitlines()
        if "windowspecdefinition" in line
    ]
    assert win_lines and all("__shard" in line for line in win_lines)


def test_sub_sharded_window_strict_rejects_thin_shards(spark):
    from medallion_data_warehouse_on_azure_with_databricks_pyspark_spark.operators.skew import (
        sub_sharded_bounded_window,
    )

    import pytest

    # 40 rows / 8 shards = 5 rows per shard << lookback 20: must refuse
    df = _hotkey_df(spark).filter("event_type = 'a'")
    with pytest.raises(ValueError, match="thinner than lookback"):
        sub_sharded_bounded_window(
            df, "event_type", "ts", "event_id", 20,
            {"n": lambda w: F.count("value").over(w)}, shards=8,
        )


def test_rolling_anomaly_sharded_equals_plain(spark):
    from medallion_data_warehouse_on_azure_with_databricks_pyspark_spark.operators import (
        temporal,
    )

    df = _hotkey_df(spark).filter("event_type = 'whale'")
    plain = temporal.rolling_anomaly(df)
    sharded = temporal.rolling_anomaly(df, shards=8)
    cols = plain.columns
    assert sorted(map(tuple, plain.select(*cols).collect())) == sorted(
        map(tuple, sharded.select(*cols).collect())
    )
    assert plain.count() > 0  # the planted spikes actually flag


def test_sub_sharded_range_window_equals_plain_window(spark):
    from pyspark.sql import Window

    from medallion_data_warehouse_on_azure_with_databricks_pyspark_spark.operators.skew import (
        sub_sharded_range_window,
    )

    df = _hotkey_df(spark).withColumn(
        "__v", F.floor(F.col("value") * 1000).cast("long")
    )
    exprs = {
        "n": lambda w: F.count("__v").over(w),
        "s1": lambda w: F.sum("__v").over(w),
    }
    rng = 15
    plain_w = (
        Window.partitionBy("event_type")
        .orderBy(F.col("ts").asc())
        .rangeBetween(-rng, -1)
    )
    plain = df
    for name, fn in exprs.items():
        plain = plain.withColumn(name, fn(plain_w))
    sharded = sub_sharded_range_window(
        df, "event_type", "ts", rng, exprs, shards=8,
        hot_threshold=500,  # only the whale shards; 40-row keys stay plain
    )
    cols = ["event_type", "event_id", "n", "s1"]
    assert sorted(map(tuple, sharded.select(*cols).collect())) == sorted(
        map(tuple, plain.select(*cols).collect())
    )


def test_sub_sharded_range_window_strict_rejects_narrow_spans(spark):
    import pytest

    from medallion_data_warehouse_on_azure_with_databricks_pyspark_spark.operators.skew import (
        sub_sharded_range_window,
    )

    # whale spans ts 0..1999; 8 shards ≈ 250 per span << lookback 400
    df = _hotkey_df(spark).filter("event_type = 'whale'")
    with pytest.raises(ValueError, match="narrower than lookback_range"):
        sub_sharded_range_window(
            df, "event_type", "ts", 400,
            {"n": lambda w: F.count("value").over(w)}, shards=8,
        )


@pytest.mark.slow  # opt-in tier: fuzz/e2e (pytest.ini)
def test_sub_sharded_window_randomized_parity(spark):
    """Seeded randomized sweep: sharded == plain across random sizes,
    lookbacks, shard counts, duplicate timestamps, and negative values —
    the parity must hold for ANY input the strict pre-check accepts."""
    import random

    from pyspark.sql import Window

    from medallion_data_warehouse_on_azure_with_databricks_pyspark_spark.operators.skew import (
        sub_sharded_bounded_window,
    )

    rnd = random.Random(7)
    for _ in range(3):
        n = rnd.randint(150, 300)
        lookback = rnd.randint(1, 6)
        shards = rnd.choice([2, 3, 4])
        rows = [
            ("hot", i * 2 + rnd.randint(0, 1), i,
             float(rnd.randint(-40, 40)))
            for i in range(n)
        ] + [
            ("cold", 10_000 + i, 10_000 + i, float(i)) for i in range(9)
        ]
        df = spark.createDataFrame(
            rows, "k string, ts long, event_id long, v double"
        )
        exprs = {
            "n": lambda w: F.count("v").over(w),
            "s": lambda w: F.sum("v").over(w),
            "mx": lambda w: F.max("v").over(w),
        }
        plain_w = (
            Window.partitionBy("k").orderBy("ts", "event_id")
            .rowsBetween(-lookback, -1)
        )
        plain = df
        for name, fn in exprs.items():
            plain = plain.withColumn(name, fn(plain_w))
        sharded = sub_sharded_bounded_window(
            df, "k", "ts", "event_id", lookback, exprs, shards=shards,
            hot_threshold=100,
        )
        cols = ["k", "event_id", "n", "s", "mx"]
        assert sorted(map(tuple, sharded.select(*cols).collect())) == sorted(
            map(tuple, plain.select(*cols).collect())
        ), (n, lookback, shards)


# ---------------------------------------------------------------------------
# Round 13: sub-sharded rank family (VERDICT r12 ask #4)
# ---------------------------------------------------------------------------

def _rank_fixture(spark):
    """A planted whale key (2000 rows, with ties) among normal keys."""
    rows = [("whale", i % 400 * 1.0, i) for i in range(2000)]
    rows += [("k1", float(i), 10_000 + i) for i in range(37)]
    rows += [("k2", 5.0, 20_000 + i) for i in range(9)]  # all-ties key
    return spark.createDataFrame(rows, "key string, amt double, id long")


def _plain_ranks(df, order_by):
    from pyspark.sql import Window

    order = [F.col(c).desc() if d else F.col(c).asc() for c, d in order_by]
    w = Window.partitionBy("key").orderBy(*order)
    return df.withColumns(
        {"rank": F.rank().over(w), "dense_rank": F.dense_rank().over(w),
         "row_number": F.row_number().over(w)}
    )


def _assert_rank_parity(spark, order_by, **kw):
    df = _rank_fixture(spark)
    got = skew.sub_sharded_ranked(df, ["key"], order_by, **kw)
    want = _plain_ranks(df, order_by)
    cols = ["key", "amt", "id", "rank", "dense_rank", "row_number"]
    assert sorted(map(tuple, got.select(*cols).collect())) == sorted(
        map(tuple, want.select(*cols).collect())
    )


def test_sub_sharded_ranked_equals_plain_desc(spark):
    """Bit-equality vs the plain window on a planted 2000-row whale key,
    ties included (desc order — the reference's Silver_Orders shape)."""
    _assert_rank_parity(spark, [("amt", True), ("id", False)], shards=8)


def test_sub_sharded_ranked_equals_plain_asc(spark):
    _assert_rank_parity(spark, [("amt", False), ("id", False)], shards=5)


def test_sub_sharded_ranked_hot_threshold_mixes_populations(spark):
    """Only the whale key shards; small keys ride shard 0 unchanged."""
    _assert_rank_parity(
        spark, [("amt", True), ("id", False)], shards=8, hot_threshold=1000
    )


def test_sub_sharded_ranked_amt_only_order_ties_stitch(spark):
    """Rank/dense_rank with an ambiguous tie-heavy order (amt only): tie
    groups never straddle shards, so gaps and dense runs stitch exactly.
    row_number is excluded — it is nondeterministic under ties on both
    paths (same contract as the plain window)."""
    df = _rank_fixture(spark)
    got = skew.sub_sharded_ranked(
        df, ["key"], [("amt", True)], kinds=("rank", "dense_rank"), shards=8
    )
    want = _plain_ranks(df, [("amt", True)])
    cols = ["key", "amt", "id", "rank", "dense_rank"]
    assert sorted(map(tuple, got.select(*cols).collect())) == sorted(
        map(tuple, want.select(*cols).collect())
    )


def test_sub_sharded_ranked_plan_partitions_by_shard(spark):
    """The local rank window must partition by (key, shard) — the
    parallelism claim — and the offsets side must broadcast."""
    df = _rank_fixture(spark)
    got = skew.sub_sharded_ranked(
        df, ["key"], [("amt", True), ("id", False)], shards=8
    )
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "__shard" in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" in plan


def test_ranked_all_shards_param_routes_and_matches(spark):
    from medallion_data_warehouse_on_azure_with_databricks_pyspark_spark.operators import (
        windows,
    )

    df = _rank_fixture(spark)
    got = windows.ranked_all(
        df, ["key"], [("amt", True), ("id", False)], prefix="p_", shards=4
    )
    want = windows.ranked_all(
        df, ["key"], [("amt", True), ("id", False)], prefix="p_"
    )
    cols = ["key", "amt", "id", "p_rank", "p_dense_rank", "p_row_number"]
    assert sorted(map(tuple, got.select(*cols).collect())) == sorted(
        map(tuple, want.select(*cols).collect())
    )


def test_sub_sharded_ranked_randomized_parity(spark):
    """Seeded randomized sweep for the rank stitch: sharded == plain
    across random sizes, shard counts, orders (asc/desc), and heavy
    duplicate-value populations (tie-group co-location is the load-
    bearing property — random ties stress it)."""
    import random

    rnd = random.Random(13)
    for trial in range(3):
        n = rnd.randint(150, 300)
        shards = rnd.choice([2, 3, 5, 8])
        desc = rnd.choice([True, False])
        vals = rnd.randint(5, 60)  # small domain => many ties
        rows = [
            ("hot", float(rnd.randint(0, vals)), i) for i in range(n)
        ] + [
            ("cold", float(rnd.randint(0, 5)), 10_000 + i) for i in range(7)
        ]
        df = spark.createDataFrame(rows, "key string, amt double, id long")
        order = [("amt", desc), ("id", False)]
        got = skew.sub_sharded_ranked(df, ["key"], order, shards=shards)
        want = _plain_ranks(df, order)
        cols = ["key", "amt", "id", "rank", "dense_rank", "row_number"]
        assert sorted(map(tuple, got.select(*cols).collect())) == sorted(
            map(tuple, want.select(*cols).collect())
        ), (trial, n, shards, desc, vals)


def test_sub_sharded_ranked_refuses_null_order_values(spark):
    """A null leading order value would silently land in the wrong shard
    and skew every stitched rank — the operator refuses loudly instead
    (executor-side assert_true, zero extra jobs; raises at action
    time)."""
    import pytest

    rows = [("hot", float(i % 50), i) for i in range(500)]
    rows += [("hot", None, 9999)]
    df = spark.createDataFrame(rows, "key string, amt double, id long")
    with pytest.raises(Exception, match="non-null"):
        skew.sub_sharded_ranked(
            df, ["key"], [("amt", True), ("id", False)], shards=4
        ).collect()
    # keys excluded from sharding may carry nulls: plain-window semantics
    got = skew.sub_sharded_ranked(
        df, ["key"], [("amt", True), ("id", False)], shards=4,
        hot_threshold=10_000,  # nothing shards
    )
    want = _plain_ranks(df, [("amt", True), ("id", False)])
    cols = ["key", "id", "rank", "dense_rank", "row_number"]
    assert sorted(map(tuple, got.select(*cols).collect())) == sorted(
        map(tuple, want.select(*cols).collect())
    )



def test_sub_sharded_ranked_multi_column_partition(spark):
    """Composite partition keys shard and stitch exactly (the operator
    is list-typed throughout — bounds, offsets, and joins all key on the
    full tuple)."""
    from pyspark.sql import Window

    rows = [
        ("a", g, float(i % 37), 100 * g + i)
        for g in range(2) for i in range(400)
    ] + [("b", 0, float(i), 9000 + i) for i in range(11)]
    df = spark.createDataFrame(rows, "k1 string, k2 int, amt double, id long")
    got = skew.sub_sharded_ranked(
        df, ["k1", "k2"], [("amt", True), ("id", False)], shards=4
    )
    w = Window.partitionBy("k1", "k2").orderBy(
        F.col("amt").desc(), F.col("id").asc()
    )
    want = df.withColumns(
        {"rank": F.rank().over(w), "dense_rank": F.dense_rank().over(w),
         "row_number": F.row_number().over(w)}
    )
    cols = ["k1", "k2", "id", "rank", "dense_rank", "row_number"]
    assert sorted(map(tuple, got.select(*cols).collect())) == sorted(
        map(tuple, want.select(*cols).collect())
    )


def test_sub_sharded_row_numbers_set_parity(spark):
    """Hash-sharded arbitrary-order row numbering: the per-key (key,
    row_no) SET must equal the plain window's — a permutation of 1..n
    per key — across a whale key, cold keys, and true duplicate rows
    (identical full rows hash to one shard; only balance is affected)."""
    rows = [("whale", i % 5) for i in range(2000)]  # many identical rows
    rows += [("k1", i) for i in range(7)]
    rows += [("k2", 0)]
    df = spark.createDataFrame(rows, "key string, v int")
    got = skew.sub_sharded_row_numbers(df, ["key"], out="rn", shards=8)
    sets = {
        r["key"]: r["ns"]
        for r in got.groupBy("key").agg(
            F.sort_array(F.collect_list("rn")).alias("ns")
        ).collect()
    }
    assert sets["whale"] == list(range(1, 2001))
    assert sets["k1"] == list(range(1, 8))
    assert sets["k2"] == [1]
    # hot_threshold: cold keys ride shard 0, whale still full-range
    got2 = skew.sub_sharded_row_numbers(
        df, ["key"], out="rn", shards=8, hot_threshold=1000
    )
    sets2 = {
        r["key"]: r["ns"]
        for r in got2.groupBy("key").agg(
            F.sort_array(F.collect_list("rn")).alias("ns")
        ).collect()
    }
    assert sets2 == sets


def test_duplicates_sharded_set_equals_plain(spark):
    from medallion_data_warehouse_on_azure_with_databricks_pyspark_spark.operators import (
        windows,
    )

    df = spark.read.parquet(f"{SF}/orders.parquet")
    plain = windows.duplicates(df, ["o_custkey"], out="row_no")
    sharded = windows.duplicates(df, ["o_custkey"], out="row_no", shards=8)
    key = lambda d: sorted(  # noqa: E731
        map(tuple, d.select("o_custkey", "row_no").collect())
    )
    assert key(sharded) == key(plain)


def test_latest_per_key_agg_strategy_equals_window(spark):
    """The max_by aggregation pick must equal the window pick wherever
    sequences are unique, keep the same schema, and stay a pure
    partial-aggregable plan (no Window operator, no per-key sort)."""
    from medallion_data_warehouse_on_azure_with_databricks_pyspark_spark.operators import (
        windows,
    )

    rows = [(1, i, f"v{i}") for i in range(100_000)]  # whale key
    rows += [(k, 0, f"cold{k}") for k in range(2, 30)]
    df = spark.createDataFrame(rows, "product_id long, seq long, name string")
    win = windows.latest_per_key(df, ["product_id"], "seq", strategy="window")
    agg = windows.latest_per_key(df, ["product_id"], "seq", strategy="agg")
    assert agg.columns == win.columns
    key = lambda d: sorted(map(tuple, d.collect()))  # noqa: E731
    assert key(agg) == key(win)
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    # struct payloads compile to SortAggregate, but the load-bearing
    # property is the MAP-SIDE PARTIAL: a whale key collapses to one row
    # per input partition BEFORE the shuffle
    assert "partial_max_by" in plan
    # keep_col parity: the agg path stamps the constant rn=1
    k2 = windows.latest_per_key(
        df, ["product_id"], "seq", keep_col=True, strategy="agg"
    )
    assert k2.where("__rn <> 1").count() == 0


def test_latest_per_key_null_sequences_match_window(spark):
    """ADVICE r14 #1: NULL sequence values must not break strategy
    interchangeability.  A key whose rows ALL carry a NULL sequence must
    return one intact (non-NULL payload) row — the window's desc NULLS
    LAST picks an arbitrary row; the agg must too, never a row of NULLs.
    Mixed keys must pick among the non-null sequences only."""
    from medallion_data_warehouse_on_azure_with_databricks_pyspark_spark.operators import (
        windows,
    )

    rows = [
        (1, None, "only-null-a"), (1, None, "only-null-b"),  # all-null key
        (2, None, "lo"), (2, 5, "mid"), (2, 9, "hi"),        # mixed key
        (3, 7, "solo"),                                      # plain key
    ]
    df = spark.createDataFrame(rows, "product_id long, seq long, name string")
    win = windows.latest_per_key(df, ["product_id"], "seq", strategy="window")
    agg = windows.latest_per_key(df, ["product_id"], "seq", strategy="agg")
    assert agg.columns == win.columns
    got = {r["product_id"]: r for r in agg.collect()}
    assert set(got) == {1, 2, 3}
    # all-null key: intact arbitrary row, not a NULL payload
    assert got[1]["name"] in {"only-null-a", "only-null-b"}
    assert got[1]["seq"] is None
    # mixed key: NULLS-LAST semantics — the max non-null sequence wins
    assert (got[2]["seq"], got[2]["name"]) == (9, "hi")
    assert (got[3]["seq"], got[3]["name"]) == (7, "solo")
    # window strategy agrees on every deterministic cell
    wgot = {r["product_id"]: r for r in win.collect()}
    assert (wgot[2]["seq"], wgot[2]["name"]) == (9, "hi")
    assert wgot[1]["name"] in {"only-null-a", "only-null-b"}
