"""Z-order layout: Morton key correctness vs a Python reference, and the
range-disjoint file property the pruning story depends on."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from medallion_data_warehouse_on_azure_with_databricks_pyspark_spark.functions import (
    layout,
)


def _morton_ref(a: int, b: int, bits: int = 31) -> int:
    out = 0
    for i in range(bits):
        out |= ((a >> i) & 1) << (2 * i)
        out |= ((b >> i) & 1) << (2 * i + 1)
    return out


def test_zorder_key_matches_python_reference(spark):
    import random

    rng = random.Random(5)
    rows = [(rng.randrange(0, 1 << 31), rng.randrange(0, 1 << 31)) for _ in range(200)]
    rows += [(0, 0), (1, 0), (0, 1), ((1 << 31) - 1, (1 << 31) - 1)]
    df = spark.createDataFrame(rows, "a long, b long")
    got = {
        (r["a"], r["b"]): r["z"]
        for r in df.withColumn("z", layout.zorder_key("a", "b")).collect()
    }
    for a, b in rows:
        assert got[(a, b)] == _morton_ref(a, b), (a, b)


def test_zorder_layout_files_are_range_disjoint_and_compact(spark, tmp_path):
    """After zorder_layout, each parquet file covers a Morton range that
    does not overlap any other file's — the precondition for min/max
    skipping on both dimensions."""
    import itertools

    df = spark.range(4096).select(
        (F.col("id") % 64).alias("x"), (F.col("id") / 64).cast("long").alias("y")
    )
    out = tmp_path / "z"
    layout.zorder_layout(df, "x", "y", n_files=8).write.parquet(str(out))
    back = (
        spark.read.parquet(str(out))
        .withColumn("z", layout.zorder_key("x", "y"))
        .withColumn("f", F.input_file_name())
    )
    ranges = {
        r["f"]: (r["mn"], r["mx"])
        for r in back.groupBy("f").agg(
            F.min("z").alias("mn"), F.max("z").alias("mx")
        ).collect()
    }
    assert len(ranges) >= 4
    for (f1, (a1, b1)), (f2, (a2, b2)) in itertools.combinations(ranges.items(), 2):
        assert b1 < a2 or b2 < a1, (f1, f2)  # no Morton-range overlap


def test_zorder_query_matches_raw_filter_and_pushes_predicates(spark):
    """The registered docs_zorder_pruned_scan query: layout must never
    change results (same rows as filtering the raw table), and both
    filter dimensions must reach the parquet scan as pushed predicates
    so min/max skipping can act on the clustered files."""
    from medallion_data_warehouse_on_azure_with_databricks_pyspark_spark import (
        workload,
    )
    from tests.conftest import SF_DIR

    q = workload.QUERIES["docs_zorder_pruned_scan"](spark, SF_DIR)
    got = {(r["doc_id"], r["lang"], r["n_chars"]) for r in q.collect()}
    raw = {
        (r["doc_id"], r["lang"], r["n_chars"])
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .filter(F.col("n_chars").between(100, 300) & F.col("doc_id").between(50, 350))
        .select("doc_id", "lang", "n_chars")
        .collect()
    }
    assert got == raw and len(got) > 0

    # toString truncates PushedFilters with "..."; formatted explain lists
    # every pushed predicate in full.
    fm = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan = q._jdf.queryExecution().explainString(fm)
    for col in ("n_chars", "doc_id"):
        assert f"GreaterThanOrEqual({col}," in plan, plan
        assert f"LessThanOrEqual({col}," in plan, plan


def test_zorder_layout_envelopes_prune_documents(spark):
    """Geometry check on the query's actual output files: each clustered
    file covers a compact sub-envelope of the (n_chars, doc_id) plane, so
    a both-dimension predicate can skip most files — the whole point of
    paying the one-time layout shuffle."""
    from medallion_data_warehouse_on_azure_with_databricks_pyspark_spark import (
        workload,
        workload_ext,
    )
    from tests.conftest import SF_DIR

    # materialize the layout via the registered query
    workload.QUERIES["docs_zorder_pruned_scan"](spark, SF_DIR).count()
    back = (
        spark.read.parquet(workload_ext.zorder_layout_path(SF_DIR))
        .withColumn("f", F.input_file_name())
    )
    env = back.groupBy("f").agg(
        F.min("n_chars").alias("cmin"), F.max("n_chars").alias("cmax"),
        F.min("doc_id").alias("dmin"), F.max("doc_id").alias("dmax"),
    ).collect()
    assert len(env) >= 4
    full_c = max(r["cmax"] for r in env) - min(r["cmin"] for r in env)
    full_d = max(r["dmax"] for r in env) - min(r["dmin"] for r in env)
    # average per-file envelope area must be a small fraction of the full
    # plane (a random layout would put every file near area ≈ full area)
    areas = [
        (r["cmax"] - r["cmin"]) * (r["dmax"] - r["dmin"]) for r in env
    ]
    avg_frac = (sum(areas) / len(areas)) / max(full_c * full_d, 1)
    assert avg_frac <= 0.5, avg_frac


def test_dynamic_partition_pruning_fires_on_partitioned_writes(spark, tmp_path):
    """SURVEY §4 physical-optimization surface: a fact table written with
    the engine's ``partition_by`` layout gets DYNAMIC partition pruning
    when joined to a filtered dimension — the fact scan's PartitionFilters
    carry a runtime ``dynamicpruning`` subquery, so only the partitions
    the dim filter selects are read.  This is the read-side payoff the
    partitioned writers exist for; results equal the unpartitioned join."""
    from pyspark.sql import functions as F

    from medallion_data_warehouse_on_azure_with_databricks_pyspark_spark.sources import (
        writers,
    )

    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    fact = str(tmp_path / "fact")
    writers.overwrite_path(orders, fact, partition_by=["o_orderpriority"])
    dim = (
        orders.select("o_orderpriority").distinct()
        .withColumn(
            "rank_level", F.substring("o_orderpriority", 1, 1).cast("int")
        )
    )
    dim.write.parquet(str(tmp_path / "dim"))
    d = spark.read.parquet(str(tmp_path / "dim")).filter(F.col("rank_level") <= 2)
    j = spark.read.parquet(fact).join(d, "o_orderpriority")
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:2000]
    expected = orders.join(d, "o_orderpriority").count()
    assert j.count() == expected > 0


def test_runtime_bloom_filter_semi_join_reduction(spark):
    """SURVEY §4: Spark's runtime bloom-filter injection prunes the big
    (application) side of a shuffle join with a selective build side.  The
    default gates are sized for production (application side ≥ 10 GB scan)
    so the optimization is silent at test scale — lowering the gate shows
    the rewrite fires on the engine's fact/dim join shape, and results are
    unchanged.  At 100 TB the defaults trigger on their own; nothing in
    the engine disables them."""
    from pyspark.sql import functions as F

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    join = lambda: li.join(orders, li.l_orderkey == orders.o_orderkey)  # noqa: E731
    expected = join().count()
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    originals = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        j = join()
        plan = j._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom" in plan.lower(), plan[:1500]
        assert j.count() == expected
    finally:
        for k, v in originals.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_zorder_key_n_three_dims_and_2d_equivalence(spark):
    from pyspark.sql import functions as F

    from medallion_data_warehouse_on_azure_with_databricks_pyspark_spark.functions import (
        layout,
    )

    df = spark.range(64).select(
        (F.col("id") % 4).alias("a"),
        (F.floor(F.col("id") / 4) % 4).alias("b"),
        (F.floor(F.col("id") / 16) % 4).alias("c"),
    )
    # 2-D zorder_key delegates to the n-D interleave bit-identically
    two = df.withColumn("z1", layout.zorder_key("a", "b")).withColumn(
        "z2", layout.zorder_key_n(["a", "b"])
    )
    assert two.filter("z1 <> z2").count() == 0
    # 3-D: bit i of column j lands at 3i+j — verify a known point
    got = (
        df.filter("a = 3 AND b = 1 AND c = 2")
        .select(layout.zorder_key_n(["a", "b", "c"], bits=2).alias("z"))
        .first()["z"]
    )
    # a=0b11 -> bits 0,3; b=0b01 -> bit 1; c=0b10 -> bit 5
    assert got == (1 << 0) + (1 << 3) + (1 << 1) + (1 << 5)


def test_recluster_zorder_three_columns(spark, tmp_path):
    """Delta's ZORDER BY takes any column list: a 3-D recluster heals
    overlap on all three dimensions and the box predicate prunes on a
    3-column conjunction."""
    from pyspark.sql import functions as F

    from medallion_data_warehouse_on_azure_with_databricks_pyspark_spark.functions import (
        layout,
    )
    from medallion_data_warehouse_on_azure_with_databricks_pyspark_spark.sources import (
        skipping,
        versioned,
    )

    t = str(tmp_path / "t3")
    df = spark.range(24_000).select(
        F.col("id").alias("a"),
        (F.col("id") * 2654435761 % 100_000).alias("b"),
        F.floor(F.col("id") / 7).alias("c"),
    )
    versioned.overwrite_versioned(df.repartition(27), t, now=1.0)
    cols = ["a", "b", "c"]
    pre = layout.cluster_health(spark, t, cols)
    assert pre["worst_mean_depth"] > 4
    layout.recluster_zorder(spark, t, *cols, now=2.0)
    post = layout.cluster_health(spark, t, cols)
    # the 1-D depth floor for k-dim tiling is F^((k-1)/k): 27 files in
    # 3 dims tile ~3 per axis, so a point on one axis intersects ~9
    # files -- the known Z-order trade of clustering MORE dimensions
    assert post["worst_mean_depth"] < 27 ** (2 / 3) + 1
    assert post["worst_mean_depth"] < pre["worst_mean_depth"] * 0.7
    assert versioned.read_current(spark, t).count() == 24_000
    kept, total = skipping.pruned_files_multi(
        spark, t, {"a": (0, 999), "b": (0, 20_000), "c": (0, 200)}
    )
    assert total == 27 and len(kept) < total


def test_cluster_health_serves_from_stats_manifest_and_verifies(spark, tmp_path):
    """A stats-maintained table polls cluster health from the skipping
    manifest (metadata-only — no row scan at 100 TB); a manifest that
    does not describe the exact live file set is DISTRUSTED and the
    poll falls back to the scan."""
    from pyspark.sql import functions as F

    from medallion_data_warehouse_on_azure_with_databricks_pyspark_spark.functions import (
        layout,
    )
    from medallion_data_warehouse_on_azure_with_databricks_pyspark_spark.sources import (
        skipping,
        versioned,
    )

    t = str(tmp_path / "t")
    df = spark.range(4_000).select(
        F.col("id").alias("a"), (F.col("id") * 7 % 997).alias("b")
    )
    versioned.overwrite_versioned(
        df.repartition(6), t, now=1.0, stats_columns=["a", "b"]
    )
    fast = layout.cluster_health(spark, t, ["a", "b"])
    # ground truth from the direct column scan
    slow_env = layout.file_envelopes(spark, t, ["a", "b"]).collect()
    slow = {"files": len(slow_env)}
    assert fast["files"] == slow["files"] == 6
    # poison the manifest: drop one file's row -> set mismatch -> fallback
    man = skipping.read_stats_manifest(spark, t)
    poisoned = man.limit(man.count() - 1)
    import os

    out = os.path.join(t, skipping.STATS_DIR)
    poisoned.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "p"))
    spark.read.parquet(str(tmp_path / "p")).coalesce(1).write.mode(
        "overwrite"
    ).parquet(out)
    fallback = layout.cluster_health(spark, t, ["a", "b"])
    assert fallback["files"] == 6  # scan path: still the true live set
    assert fallback["worst_mean_depth"] == fast["worst_mean_depth"]


def test_hilbert_recluster_heals_and_beats_or_matches_morton(spark, tmp_path):
    """curve='hilbert': the 2-D Hilbert layout (broadcast B²-cell lookup
    over the same quantile buckets) heals a decayed layout at least as
    well as Morton on the same data — consecutive Hilbert cells are
    edge-adjacent, so key ranges cover tighter boxes — and the rewrite
    is value-preserving."""
    from pyspark.sql import functions as F

    from medallion_data_warehouse_on_azure_with_databricks_pyspark_spark.functions import (
        layout,
    )
    from medallion_data_warehouse_on_azure_with_databricks_pyspark_spark.sources import (
        versioned,
    )

    df = spark.range(16_000).select(
        F.col("id").alias("a"),
        (F.col("id") * 2654435761 % 65_536).alias("b"),
    )
    depths = {}
    for curve in ("morton", "hilbert"):
        t = str(tmp_path / curve)
        versioned.overwrite_versioned(df.repartition(16), t, now=1.0)
        pre = layout.cluster_health(spark, t, ["a", "b"])
        assert pre["worst_mean_depth"] > 4
        layout.recluster_zorder(spark, t, "a", "b", now=2.0, curve=curve)
        post = layout.cluster_health(spark, t, ["a", "b"])
        depths[curve] = post["worst_mean_depth"]
        # 16 files in 2 dims tile ~4 per axis: the 1-D depth floor is
        # ~sqrt(F); assert real healing, not a specific constant
        assert post["worst_mean_depth"] < pre["worst_mean_depth"] * 0.8
        got = sorted(map(tuple, versioned.read_current(spark, t).collect()))
        assert got == sorted(map(tuple, df.collect()))
    # hilbert locality is never worse than morton's on uniform data
    # (small slack: range-partition sampling is not deterministic)
    assert depths["hilbert"] <= depths["morton"] * 1.15, depths


def test_hilbert_grid_matches_scalar_walk():
    """The vectorized grid builder must agree with the scalar xy→d walk
    on every cell (orders 1..6 cover the default bucket resolutions)."""
    from medallion_data_warehouse_on_azure_with_databricks_pyspark_spark.functions import (
        layout,
    )

    for order in range(1, 7):
        xs, ys, ds = layout.hilbert_grid(order)
        side = 1 << order
        assert len(ds) == side * side
        # bijective onto [0, side^2)
        assert sorted(ds.tolist()) == list(range(side * side))
        for x, y, d in zip(xs.tolist(), ys.tolist(), ds.tolist()):
            assert d == layout.hilbert_d(order, x, y), (order, x, y)


def test_cluster_health_liveness_keys_on_relpath_not_basename(spark, tmp_path):
    """ADVICE r14 #2: two live files in different hive-partition dirs can
    share a BASENAME; a manifest describing only ONE of them used to pass
    the basename-set liveness check and serve wrong (healthy-looking)
    envelopes.  Relpath keying must distrust it and fall back to the
    scan."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from medallion_data_warehouse_on_azure_with_databricks_pyspark_spark.functions import (
        layout,
    )
    from medallion_data_warehouse_on_azure_with_databricks_pyspark_spark.sources import (
        skipping,
    )

    t = tmp_path / "t"
    for part, lo in (("p=1", 0), ("p=2", 1000)):
        d = t / part
        d.mkdir(parents=True)
        pq.write_table(
            pa.table({"a": list(range(lo, lo + 100))}), str(d / "data.parquet")
        )
    # manifest describes ONLY p=1/data.parquet — same basename SET as the
    # live files ({data.parquet}), different relpath set
    man = spark.createDataFrame(
        [(f"file://{t}/p=1/data.parquet", 0, 99)],
        "file_path string, min__a long, max__a long",
    )
    man.coalesce(1).write.mode("overwrite").parquet(
        str(t / skipping.STATS_DIR)
    )
    health = layout.cluster_health(spark, str(t), ["a"])
    # the stale manifest (1 file) must be distrusted: the scan sees both
    assert health["files"] == 2
    assert health["columns"]["a"]["max_depth"] == 1  # disjoint envelopes


def test_cluster_health_resolves_live_files_on_manifest_mode(spark, tmp_path):
    """ADVICE r14 #3: the PUBLIC ``cluster_health(spark, path, cols)``
    call — no ``files=`` — on a manifest-mode versioned table must score
    only the LIVE snapshot, not superseded version files still under the
    root (which would inflate depth and trigger spurious reclusters)."""
    from pyspark.sql import functions as F

    from medallion_data_warehouse_on_azure_with_databricks_pyspark_spark.functions import (
        layout,
    )
    from medallion_data_warehouse_on_azure_with_databricks_pyspark_spark.sources import (
        versioned,
    )

    t = str(tmp_path / "t")
    df = spark.range(4_000).select(
        F.col("id").alias("a"), (F.col("id") * 7 % 997).alias("b")
    )
    versioned.overwrite_versioned(
        df.repartition(4), t, now=1.0, snapshot_mode="manifest"
    )
    versioned.overwrite_versioned(
        df.repartition(6), t, now=2.0, snapshot_mode="manifest"
    )
    v = versioned.current_version(t)
    live = versioned._snapshot_files(t, v)
    assert len(live) == 6
    health = layout.cluster_health(spark, t, ["a", "b"])
    assert health["files"] == 6  # not 10: superseded v0 files excluded
    # and it agrees with an explicit-files call (the scheduler's path)
    import os

    explicit = layout.cluster_health(
        spark, t, ["a", "b"],
        files=[os.path.join(t, rel) for rel in live],
    )
    assert explicit == health
    # file_envelopes shares the fix: no files= scores the live set only
    assert layout.file_envelopes(spark, t, ["a"]).count() == 6


def test_recluster_zorder_refuses_plain_directories(spark, tmp_path):
    """ADVICE r14 #4: recluster on a non-versioned directory (a mistaken
    cluster_specs entry) must raise like optimize_zorder — never convert
    the directory into a versioned table as a side effect."""
    import os

    from medallion_data_warehouse_on_azure_with_databricks_pyspark_spark.functions import (
        layout,
    )

    t = str(tmp_path / "plain")
    spark.range(100).selectExpr("id AS a", "id * 3 AS b").write.parquet(t)
    with pytest.raises(ValueError, match="no version log"):
        layout.recluster_zorder(spark, t, "a", "b")
    # and no version log was created as a side effect
    assert not os.path.exists(t + ".__versions")


def test_hilbert_lut_join_is_broadcast_never_smj(spark):
    """The B²-cell lookup is bounded driver-built metadata: its join must
    plan as a BroadcastHashJoin (no shuffle of the corpus on the cell
    key), and the Morton path must stay join-free pure expression —
    the plan shapes the 100 TB story depends on."""
    from pyspark.sql import functions as F

    from medallion_data_warehouse_on_azure_with_databricks_pyspark_spark.functions import (
        layout,
    )

    df = spark.range(50_000).select(
        F.col("id").alias("a"), (F.col("id") * 2654435761 % 65_536).alias("b")
    )
    hplan = (
        layout.hilbert_layout_ranked(df, "a", "b", 16)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in hplan, hplan[:2000]
    assert "SortMergeJoin" not in hplan
    mplan = (
        layout.zorder_layout_ranked(df, ["a", "b"], 16)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Join" not in mplan


def test_hilbert_curve_rejects_bad_arity(spark, tmp_path):
    import pytest

    from medallion_data_warehouse_on_azure_with_databricks_pyspark_spark.functions import (
        layout,
    )

    with pytest.raises(ValueError, match="hilbert clustering is 2-D"):
        layout.recluster_zorder(
            spark, str(tmp_path / "x"), "a", "b", "c", curve="hilbert"
        )


def test_incremental_recluster_rewrites_only_offenders(spark, tmp_path):
    """r15 liquid-clustering shape: a tight 4-tile base decayed by 3
    full-range appended files heals by rewriting ONLY the appends — the
    tight tiles keep their exact paths through the commit, the history
    row records the incremental scope, data is bit-identical, and the
    manifest-served depth drops back under the dispatch threshold."""
    from pyspark.sql import functions as F

    from medallion_data_warehouse_on_azure_with_databricks_pyspark_spark.functions import (
        layout,
    )
    from medallion_data_warehouse_on_azure_with_databricks_pyspark_spark.sources import (
        versioned,
    )

    t = str(tmp_path / "t")
    df = spark.range(20_000).select(
        F.col("id").alias("a"), (F.col("id") * 3 + F.col("id") % 7).alias("b")
    )
    main = df.filter(F.col("a") % 5 != 0)
    wide = df.filter(F.col("a") % 5 == 0)
    laid = layout.zorder_layout_ranked(main, ["a", "b"], 4)
    versioned.overwrite_versioned(
        laid, t, now=1.0, snapshot_mode="manifest", stats_columns=["a", "b"]
    )
    versioned.append_versioned(wide.repartition(3), t, now=2.0)
    pre = layout.cluster_health(spark, t, ["a", "b"])
    assert pre["worst_mean_depth"] > 3  # three full-range files on top
    tele: dict = {}
    v = layout.recluster_incremental(spark, t, "a", "b", now=3.0,
                                     telemetry=tele)
    assert v == 2
    # r16 telemetry: the call says what it saw and which path it took
    assert tele == {"offenders": 3, "live_files": 7, "mode": "incremental"}
    (meta,) = [
        e["metadata"] for e in versioned.history(t)
        if e["operation"] == "OPTIMIZE_ZORDER"
    ]
    assert meta["incremental"] is True
    assert (meta["rewritten_files"], meta["kept_files"]) == (3, 4)
    live0 = set(versioned._snapshot_files(t, 0))
    live1 = set(versioned._snapshot_files(t, 1))
    live2 = set(versioned._snapshot_files(t, 2))
    assert live0 <= live2                       # tight tiles untouched
    assert not (live1 - live0) & live2          # wide appends retired
    assert len(live2 - live1) == 3              # rewritten generation
    post = layout.cluster_health(spark, t, ["a", "b"])
    assert post["worst_mean_depth"] < pre["worst_mean_depth"] * 0.7
    got = sorted(map(tuple, versioned.read_current(spark, t).collect()))
    assert got == sorted(map(tuple, df.collect()))
    # already tight: a second call is a no-op that never churns history
    tele2: dict = {}
    assert layout.recluster_incremental(spark, t, "a", "b", now=4.0,
                                        telemetry=tele2) == 2
    assert versioned.current_version(t) == 2
    assert tele2["mode"] == "noop" and tele2["offenders"] == 0


def test_incremental_recluster_full_decay_falls_back_to_full(spark, tmp_path):
    """Every live file an offender (round-robin decay) == global decay:
    the incremental path must route through the full snapshot rewrite
    (same I/O, single-generation result) rather than a file-by-file
    replace of everything."""
    from pyspark.sql import functions as F

    from medallion_data_warehouse_on_azure_with_databricks_pyspark_spark.functions import (
        layout,
    )
    from medallion_data_warehouse_on_azure_with_databricks_pyspark_spark.sources import (
        versioned,
    )

    t = str(tmp_path / "t")
    df = spark.range(12_000).select(
        F.col("id").alias("a"), (F.col("id") * 2654435761 % 65_536).alias("b")
    )
    versioned.overwrite_versioned(
        df.repartition(12), t, now=1.0, stats_columns=["a", "b"]
    )
    pre = layout.cluster_health(spark, t, ["a", "b"])
    tele: dict = {}
    v = layout.recluster_incremental(spark, t, "a", "b", now=2.0,
                                     telemetry=tele)
    assert v == 1
    assert tele["mode"] == "full_fallback"
    assert tele["offenders"] == tele["live_files"] == 12
    (meta,) = [
        e.get("metadata") or {} for e in versioned.history(t)
        if e["operation"] == "OPTIMIZE_ZORDER"
    ]
    assert "incremental" not in meta  # the full-rewrite commit shape
    post = layout.cluster_health(spark, t, ["a", "b"])
    assert post["worst_mean_depth"] < pre["worst_mean_depth"] * 0.8


def test_incremental_recluster_refuses_string_clustering_column(
    spark, tmp_path
):
    """r16 (VERDICT r15 ask #3): a string clustering column cannot feed
    morton/hilbert's quantile rank-scaling, so the spec is refused
    LOUDLY and by name — mirroring the 3-D hilbert refusal — instead of
    a bare TypeError/AnalysisException from deep inside the sweep.
    Nothing commits.  The refusal names the working alternative:
    curve='sorted' takes the SAME spec."""
    import pytest
    from pyspark.sql import functions as F

    from medallion_data_warehouse_on_azure_with_databricks_pyspark_spark.functions import (
        layout,
    )
    from medallion_data_warehouse_on_azure_with_databricks_pyspark_spark.sources import (
        versioned,
    )

    t = str(tmp_path / "t")
    df = spark.range(12_000).select(
        F.col("id").alias("a"),
        F.concat(F.lit("k"), (F.col("id") % 97).cast("string")).alias("s"),
    )
    versioned.overwrite_versioned(df.repartition(12), t, now=1.0)
    with pytest.raises(ValueError, match=r"clustering column 's' is string"):
        layout.recluster_incremental(spark, t, "a", "s", now=2.0)
    with pytest.raises(ValueError, match="curve='sorted'"):
        layout.recluster_zorder(spark, t, "a", "s", now=2.0)
    assert versioned.current_version(t) == 0  # nothing committed
    # ... and the named alternative actually works on the same spec
    v = layout.recluster_zorder(spark, t, "s", "a", now=3.0, curve="sorted")
    assert v == 1
    (meta,) = [
        e["metadata"] for e in versioned.history(t)
        if e["operation"] == "OPTIMIZE_ZORDER"
    ]
    assert meta["curve"] == "sorted"
    got = sorted(map(tuple, versioned.read_current(spark, t).collect()))
    assert got == sorted(map(tuple, df.collect()))
    # linear layout on the string key: file envelopes are rank-disjoint
    # enough that mean point-query depth on s approaches 1
    post = layout.cluster_health(spark, t, ["s"])
    assert post["worst_mean_depth"] < 2.0, post


def test_sorted_layout_plan_is_one_range_exchange_no_joins(spark):
    """The sorted layout's cost contract: ONE range exchange + in-
    partition sort — no joins, no UDFs, no extra shuffles (the same
    shape zorder_layout_ranked pays minus the bucket pass).  At 100 TB
    the rewrite cost is exactly the shuffle of the rewritten bytes."""
    from medallion_data_warehouse_on_azure_with_databricks_pyspark_spark.functions import (
        layout,
    )

    df = spark.range(10_000).select(
        F.concat(F.lit("k"), (F.col("id") % 997).cast("string")).alias("s"),
        F.col("id").alias("a"),
    )
    laid = layout.sorted_layout(df, ["s", "a"], 8)
    plan = laid._jdf.queryExecution().executedPlan().toString()
    assert plan.lower().count("exchange") == 1, plan[:1500]
    assert "rangepartitioning" in plan.lower(), plan[:1500]
    assert "join" not in plan.lower(), plan[:1500]
    assert "pythonudf" not in plan.lower().replace(" ", ""), plan[:1500]
    # the layout never changes results
    assert laid.count() == 10_000


def test_incremental_recluster_sorted_heals_string_keyed_table(
    spark, tmp_path
):
    """r16: the liquid-clustering maintenance story for STRING keys —
    a sorted-layout base decayed by full-range appends heals through
    recluster_incremental(curve='sorted'): the offender selector
    measures string spans in RANK space over the bound values, only the
    appended generation is rewritten, tight tiles keep their exact
    paths, and data is bit-identical."""
    from pyspark.sql import functions as F

    from medallion_data_warehouse_on_azure_with_databricks_pyspark_spark.functions import (
        layout,
    )
    from medallion_data_warehouse_on_azure_with_databricks_pyspark_spark.sources import (
        versioned,
    )

    t = str(tmp_path / "t")
    df = spark.range(20_000).select(
        F.concat(
            F.lit("k"), F.lpad((F.col("id") % 5_000).cast("string"), 5, "0")
        ).alias("s"),
        F.col("id").alias("a"),
    )
    main = df.filter(F.col("a") % 5 != 0)
    wide = df.filter(F.col("a") % 5 == 0)  # full s-range appends
    laid = layout.sorted_layout(main, ["s"], 4)
    versioned.overwrite_versioned(
        laid, t, now=1.0, snapshot_mode="manifest", stats_columns=["s"]
    )
    versioned.append_versioned(wide.repartition(3), t, now=2.0)
    pre = layout.cluster_health(spark, t, ["s"])
    assert pre["worst_mean_depth"] > 3  # three full-range files on top
    tele: dict = {}
    v = layout.recluster_incremental(spark, t, "s", curve="sorted",
                                     now=3.0, telemetry=tele)
    assert v == 2
    assert tele == {"offenders": 3, "live_files": 7, "mode": "incremental"}
    live0 = set(versioned._snapshot_files(t, 0))
    live1 = set(versioned._snapshot_files(t, 1))
    live2 = set(versioned._snapshot_files(t, 2))
    assert live0 <= live2                       # tight tiles untouched
    assert not (live1 - live0) & live2          # wide appends retired
    post = layout.cluster_health(spark, t, ["s"])
    assert post["worst_mean_depth"] < pre["worst_mean_depth"] * 0.7
    got = sorted(map(tuple, versioned.read_current(spark, t).collect()))
    assert got == sorted(map(tuple, df.collect()))
    # already tight: no-op
    assert layout.recluster_incremental(spark, t, "s", curve="sorted",
                                        now=4.0) == 2
