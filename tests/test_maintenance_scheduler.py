"""Maintenance scheduler (VERDICT r13 ask #7): planted drift / tombstone /
mark-ratio / crashed-claim states each trigger exactly their actuator
through one ``run_maintenance`` sweep, and health clears so the next
sweep decides nothing."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from medallion_data_warehouse_on_azure_with_databricks_pyspark_spark.operators import (
    dedup,
    index_maintenance,
    similarity,
)
from medallion_data_warehouse_on_azure_with_databricks_pyspark_spark.plans import (
    maintenance as M,
)
from medallion_data_warehouse_on_azure_with_databricks_pyspark_spark.sources import (
    deletion_vectors as DV,
)
from medallion_data_warehouse_on_azure_with_databricks_pyspark_spark.streaming import (
    index_stream,
)

DOCS = "/root/testdata/sf0.001/documents.parquet"


# ---------------------------------------------------------------------------
# Pure decision logic (no Spark)
# ---------------------------------------------------------------------------

def test_decide_index_thresholds():
    healthy = {"live_ids": 100, "tombstones": 0, "replay_duplicates": 0,
               "drift_flag": None}
    assert M.decide_index(healthy) is None
    # drift outranks everything (a rebuild compacts en route)
    assert M.decide_index({**healthy, "drift_flag": {"gap": 3},
                           "tombstones": 90}) == "rebuild"
    assert M.decide_index({**healthy, "tombstones": 20}) == "compact"
    assert M.decide_index({**healthy, "tombstones": 19}) is None
    assert M.decide_index({**healthy, "replay_duplicates": 20}) == "compact"
    # policy knobs are honored
    lax = M.MaintenancePolicy(tombstone_ratio=0.5, rebuild_on_drift=False)
    assert M.decide_index({**healthy, "tombstones": 20,
                           "drift_flag": {"gap": 3}}, lax) is None
    # an empty artifact never divides by zero
    assert M.decide_index({"live_ids": 0, "tombstones": 5,
                           "replay_duplicates": 0, "drift_flag": None}) is None


def test_decide_dv_thresholds_and_intent_gate():
    healthy = {"marks": 0, "physical_rows": 100, "mark_ratio": 0.0,
               "broadcastable": True, "intent": None}
    assert M.decide_dv(healthy) is None
    assert M.decide_dv({**healthy, "marks": 30, "mark_ratio": 0.3}) == "purge"
    assert M.decide_dv({**healthy, "marks": 29, "mark_ratio": 0.29}) is None
    # a sidecar past the broadcast threshold purges even below mark_ratio
    assert M.decide_dv({**healthy, "marks": 1, "mark_ratio": 0.01,
                        "broadcastable": False}) == "purge"
    # ... but an EMPTY oversized sidecar has nothing to purge
    assert M.decide_dv({**healthy, "broadcastable": False}) is None
    # a standing intent blocks: recovery only under explicit quiescence
    held = {**healthy, "marks": 50, "mark_ratio": 0.5,
            "intent": {"op": "merge", "phase": "staging"}}
    assert M.decide_dv(held) == "blocked:intent"
    assert M.decide_dv(held, assume_quiesced=True) == "recover"


# ---------------------------------------------------------------------------
# End-to-end sweeps: planted state -> exactly one actuator -> health clears
# ---------------------------------------------------------------------------

def test_sweep_compacts_tombstone_heavy_index(spark, tmp_path):
    docs = spark.read.parquet(DOCS).limit(10)
    idx = dedup.build_minhash_index(docs, str(tmp_path / "idx"))
    victims = [r["doc_id"] for r in docs.select("doc_id").limit(3).collect()]
    index_maintenance.delete_from_index(
        spark.createDataFrame([(i,) for i in victims], "doc_id long"), idx
    )
    report = M.run_maintenance(spark, index_paths=[idx])
    (row,) = report
    assert row["action"] == "compact" and "error" not in row
    assert row["health"]["tombstones"] == 3
    # health cleared: the next sweep decides nothing
    h2 = index_maintenance.index_health(spark, idx)
    assert h2["tombstones"] == 0 and M.decide_index(h2) is None
    (row2,) = M.run_maintenance(spark, index_paths=[idx])
    assert row2["action"] is None


def test_sweep_rebuilds_on_drift_flag_and_clears_it(spark, tmp_path):
    rows = [(i, [0.5 + 0.01 * i, 0.05]) for i in range(10)]
    rows += [(10 + i, [10.0 + 0.01 * i, 0.05]) for i in range(10)]
    base = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    idx = str(tmp_path / "ivf")
    similarity.build_ivf_index(base, idx, modulus=10)
    # plant the standing flag exactly as the streaming loop writes it
    with open(os.path.join(idx, index_stream.DRIFT_FLAG_FILE), "w") as fh:
        json.dump({"rebuild_recommended": True, "gap": 4}, fh)
    (row,) = M.run_maintenance(spark, index_paths=[idx])
    assert row["action"] == "rebuild" and "error" not in row
    # the rebuild's atomic swap dropped its own trigger; index still serves
    assert index_stream.drift_flag(idx) is None
    h2 = index_maintenance.index_health(spark, idx)
    assert M.decide_index(h2) is None
    probe = base.limit(2).select(F.col("vec_id").alias("query_id"), "embedding")
    assert similarity.ivf_topk_against_index(
        probe, idx, k=3, nprobe=2, exclude_self=False
    ).count() == 6


def test_sweep_purges_mark_heavy_dv_table(spark, tmp_path):
    t = str(tmp_path / "t")
    spark.createDataFrame(
        [(g, i) for g in range(4) for i in range(10)], "g int, i int"
    ).repartition(4, "g").write.parquet(t)
    DV.delete_where_dv(spark, t, F.col("g").isin(1, 2))  # 20/40 marks
    (row,) = M.run_maintenance(spark, dv_paths=[t])
    assert row["action"] == "purge" and row["result"] == 20
    h2 = DV.dv_health(spark, t)
    assert h2["marks"] == 0 and h2["physical_rows"] == 20
    assert M.decide_dv(h2) is None
    (row2,) = M.run_maintenance(spark, dv_paths=[t])
    assert row2["action"] is None


def test_sweep_defers_on_intent_then_recovers_when_quiesced(spark, tmp_path):
    t = str(tmp_path / "t")
    spark.createDataFrame(
        [(i,) for i in range(10)], "i int"
    ).coalesce(1).write.parquet(t)
    DV.delete_where_dv(spark, t, F.col("i") >= 5)
    # a crashed writer: claim taken, never released
    DV._claim_dv_writer(t, {"op": "purge", "phase": "staging"})
    (row,) = M.run_maintenance(spark, dv_paths=[t])
    assert row["action"] == "blocked:intent" and "result" not in row
    assert DV._read_intent(t) is not None  # untouched — safety over eagerness
    (row2,) = M.run_maintenance(spark, dv_paths=[t], assume_quiesced=True)
    assert row2["action"] == "recover" and row2["result"] is True
    assert DV._read_intent(t) is None
    # with the claim gone the NEXT sweep purges the standing marks
    (row3,) = M.run_maintenance(spark, dv_paths=[t])
    assert row3["action"] == "purge" and row3["result"] == 5


def test_sweep_isolates_actuator_failure_per_table(spark, tmp_path):
    """One wedged artifact must not starve the rest of the fleet."""
    docs = spark.read.parquet(DOCS).limit(10)
    good = dedup.build_minhash_index(docs, str(tmp_path / "good"))
    bad = dedup.build_minhash_index(docs, str(tmp_path / "bad"))
    for idx in (good, bad):
        victims = [r["doc_id"] for r in docs.select("doc_id").limit(3).collect()]
        index_maintenance.delete_from_index(
            spark.createDataFrame([(i,) for i in victims], "doc_id long"), idx
        )
    # wedge the bad artifact: its bands table vanishes after the health
    # poll would... simplest deterministic wedge: drop the shingles table
    # compaction must rewrite
    import shutil

    shutil.rmtree(os.path.join(bad, "shingles"))
    report = M.run_maintenance(spark, index_paths=[bad, good])
    by_path = {r["path"]: r for r in report}
    assert "error" in by_path[bad]
    assert by_path[good]["action"] == "compact" and "error" not in by_path[good]
    assert index_maintenance.index_health(spark, good)["tombstones"] == 0


# ---------------------------------------------------------------------------
# Round 14: the table-layout leg (cluster health -> OPTIMIZE ZORDER)
# ---------------------------------------------------------------------------

def test_decide_cluster_thresholds():
    assert M.decide_cluster({"files": 20, "worst_mean_depth": 4.0}) == "recluster"
    assert M.decide_cluster({"files": 20, "worst_mean_depth": 3.9}) is None
    # a handful of files is layout noise regardless of depth
    assert M.decide_cluster({"files": 7, "worst_mean_depth": 20.0}) is None
    strict = M.MaintenancePolicy(cluster_depth=1.5, cluster_min_files=2)
    assert M.decide_cluster({"files": 2, "worst_mean_depth": 1.6}, strict) == "recluster"


def test_sweep_reclusters_decayed_layout(spark, tmp_path):
    """A table whose every file spans the full key range (the state
    appends/merges decay into) reports depth ~= file count; the sweep
    dispatches one OPTIMIZE ZORDER transaction; afterwards the envelopes
    are disjoint enough that the next sweep decides nothing, the data is
    bit-identical, and the skipping manifest prunes again."""
    from medallion_data_warehouse_on_azure_with_databricks_pyspark_spark.functions import (
        layout,
    )
    from medallion_data_warehouse_on_azure_with_databricks_pyspark_spark.sources import (
        skipping,
        versioned,
    )

    t = str(tmp_path / "t")
    # event_id and ts_bucket are correlated (the realistic decayed case:
    # a time-keyed table appended round-robin), every file full-range
    df = spark.range(12_000).select(
        F.col("id").alias("event_id"),
        F.floor(F.col("id") / 10).alias("ts_bucket"),
        (F.col("id") % 97).alias("payload"),
    )
    versioned.overwrite_versioned(
        df.repartition(12), t, now=1.0, stats_columns=["event_id", "ts_bucket"]
    )
    spec = [(t, ("event_id", "ts_bucket"))]
    (row,) = M.run_maintenance(spark, cluster_specs=spec)
    assert row["kind"] == "cluster" and row["action"] == "recluster"
    assert "error" not in row, row.get("error")
    assert row["health"]["files"] == 12
    # round-robin stripes overlap heavily (well past the 4.0 dispatch
    # threshold), even if not every file spans the literal full range
    assert row["health"]["worst_mean_depth"] > 4
    # the commit is a versioned OPTIMIZE ZORDER, data bit-identical
    hist = versioned.history(t)
    assert any(h["operation"] == "OPTIMIZE_ZORDER" for h in hist)
    got = sorted(map(tuple, versioned.read_current(spark, t).collect()))
    assert got == sorted(map(tuple, df.collect()))
    # healed: disjoint envelopes, next sweep decides nothing
    (row2,) = M.run_maintenance(spark, cluster_specs=spec)
    assert row2["action"] is None
    assert row2["health"]["worst_mean_depth"] < 2.0
    # the same commit refreshed the skipping manifest: a point predicate
    # now prunes to a sliver of the files
    kept, total = skipping.pruned_files_multi(
        spark, t, {"event_id": (100, 150), "ts_bucket": (10, 15)}
    )
    assert total == 12 and len(kept) <= 2


def test_sweep_cluster_curve_selection(spark, tmp_path):
    """r15 (VERDICT r14 ask #4): the sweep's recluster actuator selects
    the space-filling curve — a 3-element cluster_specs entry overrides
    per table, ``policy.cluster_curve`` sets the fleet default, and the
    chosen curve is auditable in the commit's history metadata."""
    from medallion_data_warehouse_on_azure_with_databricks_pyspark_spark.sources import (
        versioned,
    )

    def decayed(name):
        t = str(tmp_path / name)
        df = spark.range(12_000).select(
            F.col("id").alias("a"), (F.col("id") * 2654435761 % 65_536).alias("b")
        )
        versioned.overwrite_versioned(
            df.repartition(12), t, now=1.0, stats_columns=["a", "b"]
        )
        return t

    def committed_curve(t):
        return [
            (e.get("metadata") or {}).get("curve")
            for e in versioned.history(t)
            if e["operation"] == "OPTIMIZE_ZORDER"
        ]

    # 3-element spec overrides to hilbert
    t1 = decayed("hil")
    (row,) = M.run_maintenance(spark, cluster_specs=[(t1, ("a", "b"), "hilbert")])
    assert row["action"] == "recluster" and "error" not in row
    assert committed_curve(t1) == ["hilbert"]
    # policy default applies to 2-element specs
    t2 = decayed("pol")
    policy = M.MaintenancePolicy(cluster_curve="hilbert")
    (row2,) = M.run_maintenance(
        spark, cluster_specs=[(t2, ("a", "b"))], policy=policy
    )
    assert row2["action"] == "recluster" and "error" not in row2
    assert committed_curve(t2) == ["hilbert"]
    # and the out-of-the-box default stays morton
    t3 = decayed("mor")
    (row3,) = M.run_maintenance(spark, cluster_specs=[(t3, ("a", "b"))])
    assert row3["action"] == "recluster" and "error" not in row3
    assert committed_curve(t3) == ["morton"]
    # a hilbert dispatch on a 3-column spec fails loudly (per-table fault
    # isolation captures it, the sweep continues)
    t4 = decayed("bad")
    (row4,) = M.run_maintenance(
        spark, cluster_specs=[(t4, ("a", "b", "a"), "hilbert")]
    )
    assert "error" in row4 and "hilbert clustering is 2-D" in row4["error"]


def test_sweep_incremental_strategy_rewrites_offenders_and_escalates(
    spark, tmp_path
):
    """r15: policy.cluster_strategy='incremental' dispatches
    recluster_incremental — a generationally-decayed table heals by
    rewriting ONLY the appended wide files (history records the
    incremental scope); a STRUCTURALLY decayed table (depth above
    threshold with no offender generation to rewrite) escalates to the
    full rewrite instead of no-op-dispatching every sweep."""
    from medallion_data_warehouse_on_azure_with_databricks_pyspark_spark.functions import (
        layout,
    )
    from medallion_data_warehouse_on_azure_with_databricks_pyspark_spark.sources import (
        versioned,
    )

    policy = M.MaintenancePolicy(cluster_strategy="incremental")
    # generational decay: tight 4-tile base + 6 full-range appends
    t = str(tmp_path / "gen")
    df = spark.range(20_000).select(
        F.col("id").alias("a"), (F.col("id") * 3 + F.col("id") % 7).alias("b")
    )
    laid = layout.zorder_layout_ranked(df.filter(F.col("a") % 5 != 0),
                                       ["a", "b"], 4)
    versioned.overwrite_versioned(
        laid, t, now=1.0, snapshot_mode="manifest", stats_columns=["a", "b"]
    )
    versioned.append_versioned(
        df.filter(F.col("a") % 5 == 0).repartition(6), t, now=2.0
    )
    (row,) = M.run_maintenance(spark, cluster_specs=[(t, ("a", "b"))],
                               policy=policy)
    assert row["action"] == "recluster" and "error" not in row
    (meta,) = [
        e["metadata"] for e in versioned.history(t)
        if e["operation"] == "OPTIMIZE_ZORDER"
    ]
    assert meta["incremental"] is True and meta["rewritten_files"] == 6
    (row2,) = M.run_maintenance(spark, cluster_specs=[(t, ("a", "b"))],
                                policy=policy)
    assert row2["action"] is None  # healed, loop converges
    # structural decay: every file full-range -> escalate to full rewrite
    t2 = str(tmp_path / "struct")
    versioned.overwrite_versioned(
        df.repartition(12), t2, now=1.0, stats_columns=["a", "b"]
    )
    (row3,) = M.run_maintenance(spark, cluster_specs=[(t2, ("a", "b"))],
                                policy=policy)
    assert row3["action"] == "recluster" and "error" not in row3
    (meta2,) = [
        e.get("metadata") or {} for e in versioned.history(t2)
        if e["operation"] == "OPTIMIZE_ZORDER"
    ]
    assert "incremental" not in meta2  # routed through the full path


def test_sweep_reports_structural_escalation_reason(spark, tmp_path):
    """r16 (VERDICT r15 ask #6): when the incremental path no-ops while
    depth exceeds the threshold (zero offenders — every file is narrow
    on SOME column, yet overlap depth on another is pathological:
    uncorrelated dims), the sweep escalates to the full rewrite AND the
    report row says WHY, so a 100 TB operator can tell "appends are
    tight, one-off" from "incremental can never help — reconsider the
    clustering columns"."""
    from medallion_data_warehouse_on_azure_with_databricks_pyspark_spark.sources import (
        versioned,
    )

    policy = M.MaintenancePolicy(cluster_strategy="incremental")
    t = str(tmp_path / "t")
    # 12 files tiled tightly on b but each spanning the FULL a range:
    # depth on a ~ 12 (dispatches), yet no file is wide on EVERY column
    # -> offenders == 0 -> the incremental rewrite has nothing to do
    df = spark.range(24_000).select(
        (F.col("id") % 100).alias("a"), F.col("id").alias("b")
    )
    versioned.overwrite_versioned(
        df.repartitionByRange(12, "b"), t, now=1.0, stats_columns=["a", "b"]
    )
    (row,) = M.run_maintenance(spark, cluster_specs=[(t, ("a", "b"))],
                               policy=policy)
    assert row["action"] == "recluster" and "error" not in row
    tele = row["recluster"]
    assert tele["mode"] == "noop"
    assert tele["escalated"] is True
    assert "offenders=0 of 12" in tele["escalation_reason"]
    assert "reconsider" in tele["escalation_reason"]
    # the escalation really landed the full rewrite
    (meta,) = [
        e.get("metadata") or {} for e in versioned.history(t)
        if e["operation"] == "OPTIMIZE_ZORDER"
    ]
    assert "incremental" not in meta


def test_sweep_reports_string_spec_error_once(spark, tmp_path, monkeypatch):
    """r16 (VERDICT r15 ask #3): a string clustering column in a
    morton-curve incremental spec surfaces as ONE named spec error in
    the sweep report — fault-isolated, refused BEFORE any envelope read
    or offender selection, nothing committed — not an opaque TypeError
    per sweep forever.  The error names the working spec
    (curve='sorted')."""
    from medallion_data_warehouse_on_azure_with_databricks_pyspark_spark.functions import (
        layout,
    )
    from medallion_data_warehouse_on_azure_with_databricks_pyspark_spark.sources import (
        versioned,
    )

    policy = M.MaintenancePolicy(cluster_strategy="incremental")
    t = str(tmp_path / "t")
    df = spark.range(12_000).select(
        F.col("id").alias("a"),
        F.concat(F.lit("k"), (F.col("id") % 97).cast("string")).alias("s"),
    )
    versioned.overwrite_versioned(df.repartition(12), t, now=1.0)
    calls = {"n": 0}
    orig = layout.select_recluster_offenders

    def counting(*a, **kw):
        calls["n"] += 1
        return orig(*a, **kw)

    monkeypatch.setattr(layout, "select_recluster_offenders", counting)
    (row,) = M.run_maintenance(spark, cluster_specs=[(t, ("a", "s"))],
                               policy=policy)
    assert row["action"] == "recluster"
    assert "ValueError" in row["error"]
    assert "clustering column 's' is string" in row["error"]
    assert "curve='sorted'" in row["error"]  # the fix is named
    assert calls["n"] == 0  # refused before any selection work
    assert versioned.current_version(t) == 0  # nothing committed


def test_sweep_sorted_curve_heals_string_keyed_table(spark, tmp_path):
    """r16: the spec the refusal points at WORKS through the loop — a
    single-string-column cluster_specs entry with curve='sorted'
    dispatches, heals the layout via the linear range layout, and the
    next sweep decides nothing."""
    from medallion_data_warehouse_on_azure_with_databricks_pyspark_spark.functions import (
        layout,
    )
    from medallion_data_warehouse_on_azure_with_databricks_pyspark_spark.sources import (
        versioned,
    )

    policy = M.MaintenancePolicy(cluster_strategy="incremental")
    t = str(tmp_path / "t")
    df = spark.range(20_000).select(
        F.concat(
            F.lit("k"), F.lpad((F.col("id") % 5_000).cast("string"), 5, "0")
        ).alias("s"),
        F.col("id").alias("a"),
    )
    laid = layout.sorted_layout(df.filter(F.col("a") % 5 != 0), ["s"], 4)
    versioned.overwrite_versioned(
        laid, t, now=1.0, snapshot_mode="manifest", stats_columns=["s"]
    )
    versioned.append_versioned(
        df.filter(F.col("a") % 5 == 0).repartition(6), t, now=2.0
    )
    (row,) = M.run_maintenance(
        spark, cluster_specs=[(t, ("s",), "sorted")], policy=policy
    )
    assert row["action"] == "recluster" and "error" not in row
    assert row["recluster"]["mode"] == "incremental"
    (meta,) = [
        e["metadata"] for e in versioned.history(t)
        if e["operation"] == "OPTIMIZE_ZORDER"
    ]
    assert meta["incremental"] is True and meta["curve"] == "sorted"
    (row2,) = M.run_maintenance(
        spark, cluster_specs=[(t, ("s",), "sorted")], policy=policy
    )
    assert row2["action"] is None  # healed, loop converges


def test_sweep_auto_discovers_declared_clustering(spark, tmp_path):
    """r16 (Delta CLUSTER BY parity): versioned.set_clustering makes the
    table SELF-DESCRIBING — run_maintenance(table_paths=[t]) picks the
    declared spec up with no cluster_specs bookkeeping, heals the
    layout through the declared curve, and an explicit cluster_specs
    entry for the same path wins over the declaration.  An invalid
    declaration (string column under morton) is refused at DECLARE
    time, not at sweep time."""
    from medallion_data_warehouse_on_azure_with_databricks_pyspark_spark.functions import (
        layout,
    )
    from medallion_data_warehouse_on_azure_with_databricks_pyspark_spark.sources import (
        versioned,
    )

    policy = M.MaintenancePolicy(cluster_strategy="incremental")
    t = str(tmp_path / "t")
    df = spark.range(20_000).select(
        F.concat(
            F.lit("k"), F.lpad((F.col("id") % 5_000).cast("string"), 5, "0")
        ).alias("s"),
        F.col("id").alias("a"),
    )
    laid = layout.sorted_layout(df.filter(F.col("a") % 5 != 0), ["s"], 4)
    versioned.overwrite_versioned(
        laid, t, now=1.0, snapshot_mode="manifest", stats_columns=["s"]
    )
    versioned.append_versioned(
        df.filter(F.col("a") % 5 == 0).repartition(6), t, now=2.0
    )
    # declaring an unworkable spec is refused at declare time, by name
    with pytest.raises(ValueError, match="clustering column 's' is string"):
        versioned.set_clustering(spark, t, ["a", "s"], curve="morton")
    versioned.set_clustering(spark, t, ["s"], curve="sorted")
    assert versioned.table_detail(t)["clustering"] == {
        "cols": ["s"], "curve": "sorted",
    }
    rows = M.run_maintenance(spark, table_paths=[t], policy=policy)
    cluster_rows = [r for r in rows if r["kind"] == "cluster"]
    assert len(cluster_rows) == 1
    assert cluster_rows[0]["action"] == "recluster"
    assert "error" not in cluster_rows[0]
    (meta,) = [
        e["metadata"] for e in versioned.history(t)
        if e["operation"] == "OPTIMIZE_ZORDER"
    ]
    assert meta["curve"] == "sorted" and meta["incremental"] is True
    # healed: the next auto-discovered sweep decides nothing
    rows2 = M.run_maintenance(spark, table_paths=[t], policy=policy)
    assert [r["action"] for r in rows2 if r["kind"] == "cluster"] == [None]
    # an explicit spec for the same path wins: exactly one cluster row
    rows3 = M.run_maintenance(
        spark, table_paths=[t], cluster_specs=[(t, ("s",), "sorted")],
        policy=policy,
    )
    assert len([r for r in rows3 if r["kind"] == "cluster"]) == 1
    # dropping the declaration stops the auto leg
    versioned.set_clustering(spark, t, [])
    assert versioned.clustering_of(t) is None
    rows4 = M.run_maintenance(spark, table_paths=[t], policy=policy)
    assert [r for r in rows4 if r["kind"] == "cluster"] == []


def test_sweep_table_small_file_compaction_leg(spark, tmp_path):
    """r15: with table_compact_target_bytes set, a swept table whose
    small-file debt crosses the min-files gate dispatches ONE
    incremental OPTIMIZE (only the smalls rewritten); the healed table
    decides nothing next sweep; retention still outranks compaction
    (one actuator per table per sweep)."""
    from medallion_data_warehouse_on_azure_with_databricks_pyspark_spark.sources import (
        versioned,
    )

    t = str(tmp_path / "t")
    df = spark.range(30_000).select(
        F.col("id").alias("a"), (F.col("id") * 3).alias("b")
    )
    versioned.overwrite_versioned(df.repartition(2), t, now=1.0)
    tiny = spark.range(30_000, 30_900).select(
        F.col("id").alias("a"), (F.col("id") * 3).alias("b")
    )
    versioned.append_versioned(tiny.repartition(9), t, now=2.0)
    import os

    sizes = sorted(
        os.path.getsize(f) for f in versioned._live_data_files(t)
    )
    target = sizes[8] * 11  # above all nine tiny files, below the bigs
    assert sizes[-1] >= target > sizes[8]
    policy = M.MaintenancePolicy(table_compact_target_bytes=target,
                                 table_compact_min_files=8)
    (row,) = M.run_maintenance(spark, table_paths=[t], policy=policy)
    assert row["action"] == "compact" and "error" not in row
    assert row["health"]["small_files"] == 9
    (meta,) = [
        e["metadata"] for e in versioned.history(t)
        if e["operation"] == "OPTIMIZE"
    ]
    assert meta["incremental"] is True and meta["bin_packed"] == 9
    assert versioned.read_current(spark, t).count() == 30_900
    # healed: next sweep decides nothing
    (row2,) = M.run_maintenance(spark, table_paths=[t], policy=policy)
    assert row2["action"] is None


# ---------------------------------------------------------------------------
# Round 14: the retention leg (table_detail -> vacuum)
# ---------------------------------------------------------------------------

def test_decide_table_thresholds():
    base = {"size_bytes": 1000, "superseded_bytes": 0,
            "retained_versions": [], "intent": None}
    assert M.decide_table(base) is None
    hot = {**base, "superseded_bytes": 500, "retained_versions": [0, 1, 2]}
    assert M.decide_table(hot) == "vacuum"
    assert M.decide_table({**hot, "superseded_bytes": 499}) is None
    # not enough retained versions to vacuum past keep_last
    assert M.decide_table({**hot, "retained_versions": [0, 1]}) is None
    held = {**hot, "intent": {"op": "vacuum"}}
    assert M.decide_table(held) == "blocked:intent"
    assert M.decide_table(held, assume_quiesced=True) == "recover"


def test_sweep_vacuums_history_heavy_table(spark, tmp_path):
    from medallion_data_warehouse_on_azure_with_databricks_pyspark_spark.sources import (
        versioned,
    )

    t = str(tmp_path / "t")
    df = spark.range(5_000).withColumnRenamed("id", "k")
    for i in range(4):  # v0..v3: three retained versions of history
        versioned.overwrite_versioned(df, t, now=1.0 + i)
    (row,) = M.run_maintenance(spark, table_paths=[t])
    assert row["kind"] == "table" and row["action"] == "vacuum"
    assert "error" not in row, row.get("error")
    assert row["health"]["superseded_bytes"] > row["health"]["size_bytes"]
    assert row["result"] == [0]  # keep_last=2 keeps v1/v2, drops v0
    d2 = versioned.table_detail(t)
    assert d2["vacuumed_versions"] == [0] and d2["retained_versions"] == [1, 2]
    # history survives vacuum; current data untouched
    assert len(versioned.history(t)) == 4
    assert versioned.read_current(spark, t).count() == 5_000
    # steady state: 2 retained versions never re-trigger
    (row2,) = M.run_maintenance(spark, table_paths=[t])
    assert row2["action"] is None


def test_sweep_table_blocked_then_recovered(spark, tmp_path):
    from medallion_data_warehouse_on_azure_with_databricks_pyspark_spark.sources import (
        versioned,
    )

    t = str(tmp_path / "t")
    df = spark.range(100).withColumnRenamed("id", "k")
    for i in range(4):
        versioned.overwrite_versioned(df, t, now=1.0 + i)
    versioned._claim_intent(t, {"op": "vacuum"})  # crashed claimant
    (row,) = M.run_maintenance(spark, table_paths=[t])
    assert row["action"] == "blocked:intent" and "result" not in row
    (row2,) = M.run_maintenance(spark, table_paths=[t], assume_quiesced=True)
    assert row2["action"] == "recover" and "error" not in row2
    assert versioned._read_intent(t) is None
    (row3,) = M.run_maintenance(spark, table_paths=[t])
    assert row3["action"] == "vacuum"


def test_decide_table_never_retriggers_on_pinned_history():
    """Tag-pinned versions are unreclaimable: an all-pinned history must
    not re-dispatch a no-op vacuum every sweep."""
    d = {"size_bytes": 1000, "superseded_bytes": 900, "intent": None,
         "retained_versions": [0, 1, 2], "pinned_versions": [0, 1, 2]}
    assert M.decide_table(d) is None
    # one droppable version still isn't past keep_last=2
    assert M.decide_table({**d, "pinned_versions": [0, 1]}) is None
    # three droppable -> vacuum pays
    assert M.decide_table(
        {**d, "retained_versions": [0, 1, 2, 3, 4], "pinned_versions": [0, 1]}
    ) == "vacuum"


@pytest.mark.slow  # opt-in tier: fuzz/e2e (pytest.ini)
def test_maintain_cli_declare_then_table_sweep(spark, tmp_path):
    """r16: one CLI invocation declares CLUSTER BY on a string-keyed
    table and the SAME sweep's --table leg auto-discovers it — the ops
    story where a fleet cron lists tables, not specs."""
    import subprocess
    import sys

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
    laid = layout.sorted_layout(df.filter(F.col("a") % 5 != 0), ["s"], 4)
    versioned.overwrite_versioned(
        laid, t, now=1.0, snapshot_mode="manifest", stats_columns=["s"]
    )
    versioned.append_versioned(
        df.filter(F.col("a") % 5 == 0).repartition(6), t, now=2.0
    )
    proc = subprocess.run(
        [sys.executable, "tools/maintain.py", "--declare", f"{t}:s:sorted",
         "--table", t, "--incremental", "--master", "local[2]"],
        capture_output=True, text=True, cwd="/root/repo", timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-1500:]
    rows = [json.loads(l) for l in proc.stdout.splitlines() if l.startswith("{")]
    by_kind = {r["kind"]: r for r in rows}
    assert by_kind["declare"]["clustering"] == {"cols": ["s"],
                                                "curve": "sorted"}
    assert by_kind["cluster"]["action"] == "recluster"
    assert "error" not in by_kind["cluster"]
    (meta,) = [
        e["metadata"] for e in versioned.history(t)
        if e["operation"] == "OPTIMIZE_ZORDER"
    ]
    assert meta["curve"] == "sorted" and meta["incremental"] is True


@pytest.mark.slow  # opt-in tier: fuzz/e2e (pytest.ini)
def test_maintain_cli_dry_run_and_sweep(spark, tmp_path):
    """tools/maintain.py: --dry-run decides without dispatching; the real
    sweep acts; exit codes reflect actuator errors."""
    import subprocess
    import sys

    from medallion_data_warehouse_on_azure_with_databricks_pyspark_spark.sources import (
        versioned,
    )

    t = str(tmp_path / "t")
    df = spark.range(2_000).withColumnRenamed("id", "k")
    for i in range(4):
        versioned.overwrite_versioned(df, t, now=1.0 + i)
    # a decayed 2-D table swept through the CLI's path:a,b:hilbert spec
    c = str(tmp_path / "c")
    cdf = spark.range(12_000).select(
        F.col("id").alias("a"), (F.col("id") * 2654435761 % 65_536).alias("b")
    )
    versioned.overwrite_versioned(
        cdf.repartition(12), c, now=1.0, stats_columns=["a", "b"]
    )

    def run(*extra):
        # --incremental rides along: the 12-file round-robin table is
        # STRUCTURAL decay, so the CLI flag's path must escalate to the
        # full hilbert rewrite — flag parsing + escalation in one run
        return subprocess.run(
            [sys.executable, "tools/maintain.py", "--table", t,
             "--cluster", f"{c}:a,b:hilbert", "--incremental",
             "--master", "local[2]", *extra],
            capture_output=True, text=True, cwd="/root/repo", timeout=300,
        )

    def rows(proc):
        out = [json.loads(l) for l in proc.stdout.splitlines() if l.startswith("{")]
        return {r["kind"]: r for r in out}

    dry = run("--dry-run")
    assert dry.returncode == 0, dry.stderr[-1500:]
    drows = rows(dry)
    assert drows["table"]["action"] == "vacuum" and "result" not in drows["table"]
    assert drows["cluster"]["action"] == "recluster"
    assert versioned.table_detail(t)["retained_versions"] == [0, 1, 2]  # untouched
    assert versioned.current_version(c) == 0  # untouched

    real = run()
    assert real.returncode == 0, real.stderr[-1500:]
    rrows = rows(real)
    assert rrows["table"]["action"] == "vacuum" and rrows["table"]["result"] == [0]
    assert versioned.table_detail(t)["retained_versions"] == [1, 2]
    # the CLI spec's trailing :hilbert reached the actuator
    assert rrows["cluster"]["action"] == "recluster"
    curves = [
        (e.get("metadata") or {}).get("curve")
        for e in versioned.history(c)
        if e["operation"] == "OPTIMIZE_ZORDER"
    ]
    assert curves == ["hilbert"]


def test_compaction_and_sorted_recluster_compose_on_declared_table(
    spark, tmp_path
):
    """r17 (VERDICT r16 ask #6): BOTH maintenance legs on ONE declared
    string-keyed ``CLUSTER BY (s)`` sorted-curve table, in one fleet
    sweep — cluster leg heals layout decay, table leg packs small-file
    debt — and the loop CONVERGES instead of oscillating.  The hazard
    this pins: blind bin-packing merges disjoint-range tiles into
    full-span files, re-widening exactly the envelopes the recluster
    just tightened (compact → decay → recluster → small tiles →
    compact → ...); clustering-aware compaction (liquid-clustering
    ``OPTIMIZE``) lays the packed rows back through the declared curve."""
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
    laid = layout.sorted_layout(df.filter(F.col("a") % 5 != 0), ["s"], 4)
    versioned.overwrite_versioned(
        laid, t, now=1.0, snapshot_mode="manifest", stats_columns=["s"]
    )
    versioned.set_clustering(spark, t, ["s"], curve="sorted")
    # six small FULL-RANGE appends: layout decay AND small-file debt
    versioned.append_versioned(
        df.filter(F.col("a") % 5 == 0).repartition(6), t, now=2.0
    )
    base_sizes = sorted(
        os.path.getsize(f) for f in versioned._live_data_files(t)
    )
    target = base_sizes[-4]  # the 4 base tiles are AT/OVER target
    policy = M.MaintenancePolicy(
        cluster_strategy="incremental",
        table_compact_target_bytes=int(target),
        table_compact_min_files=2,
    )
    # sweep 1: auto-discovered declared clustering drives the cluster
    # leg; the table leg then packs the small tiles THROUGH the curve
    report = M.run_maintenance(spark, table_paths=[t], policy=policy)
    by_kind = {r["kind"]: r for r in report}
    assert by_kind["cluster"]["action"] == "recluster"
    assert "error" not in by_kind["cluster"]
    assert by_kind["cluster"]["recluster"]["mode"] == "incremental"
    assert by_kind["table"]["action"] == "compact"
    assert "error" not in by_kind["table"]
    ops = {e["operation"]: e.get("metadata", {})
           for e in versioned.history(t)}
    assert ops["OPTIMIZE_ZORDER"]["curve"] == "sorted"
    assert ops["OPTIMIZE_ZORDER"]["incremental"] is True
    assert ops["OPTIMIZE"]["clustered"] == "sorted"  # curve-aware packing
    # sweep 2: CONVERGED — the cluster leg is healed, the compact leg
    # has <2 smalls left, and the retention leg correctly declines: the
    # bytes outside the live set all sit in versions keep_last protects
    # (v1's appends, v2's tiles), and droppable v0's files are shared
    # with every kept snapshot — an actuator-faithful reclaim of 0
    # (decide_table r17; the old superseded_bytes test re-dispatched a
    # zero-reclaim vacuum here EVERY sweep, forever)
    report2 = M.run_maintenance(spark, table_paths=[t], policy=policy)
    assert [r["action"] for r in report2] == [None, None], report2
    # the packed output did not re-widen the layout: point reads stay
    # shallow on the clustering column
    health = layout.cluster_health(
        spark, t, ["s"],
        files=[os.path.join(t, r) for r in versioned._snapshot_files(
            t, versioned.current_version(t))],
    )
    assert health["worst_mean_depth"] < policy.cluster_depth
    # and the logical table is bit-stable through both legs
    got = versioned.read_current(spark, t)
    assert got.count() == 20_000
    assert (
        got.agg(F.bit_xor(F.xxhash64("s", "a")).alias("h")).first()["h"]
        == df.agg(F.bit_xor(F.xxhash64("s", "a")).alias("h")).first()["h"]
    )


@pytest.mark.parametrize("seed", [0, 1])
def test_fleet_sweeps_reach_quiescence(spark, tmp_path, seed):
    """Convergence as a PROPERTY (r17 — this round found two infinite
    re-dispatch loops: a zero-reclaim vacuum and a can't-pack compact):
    a fleet of tables seeded with random mixes of layout decay,
    small-file debt, retention debt, and DV marks must reach a state
    where one full sweep decides NOTHING, within a bounded number of
    sweeps, and stay quiescent on the sweep after that.  Any future
    probe/actuator mismatch breaks this test by construction."""
    import random

    from medallion_data_warehouse_on_azure_with_databricks_pyspark_spark.functions import (
        layout,
    )
    from medallion_data_warehouse_on_azure_with_databricks_pyspark_spark.sources import (
        versioned,
    )

    rng = random.Random(seed)
    policy = M.MaintenancePolicy(
        cluster_strategy="incremental",
        table_compact_target_bytes=24 * 1024,
        table_compact_min_files=2,
        superseded_ratio=0.3,
    )
    tables, dv_tables = [], []
    for i in range(3):
        t = str(tmp_path / f"t{i}")
        n = rng.randint(10_000, 30_000)
        df = spark.range(n).select(
            F.col("id").alias("k"), (F.col("id") * 3).alias("v")
        )
        laid = layout.sorted_layout(df.filter("id % 5 != 0"), ["k"], 3)
        versioned.overwrite_versioned(
            laid, t, now=1.0, snapshot_mode="manifest", stats_columns=["k"]
        )
        versioned.set_clustering(spark, t, ["k"], curve="sorted")
        # random debt mix
        if rng.random() < 0.8:  # decay + small files
            versioned.append_versioned(
                df.filter("id % 5 = 0").repartition(rng.randint(3, 7)),
                t, now=2.0,
            )
        if rng.random() < 0.5:  # retention debt
            versioned.update_where(
                spark, t, F.col("k") % 3 == 0,
                {"v": F.col("v") + F.lit(1)}, now=3.0,
            )
        tables.append(t)
    # one plain DV table with purge-worthy mark debt
    d = str(tmp_path / "dv")
    spark.range(100).select(F.col("id").alias("k")).coalesce(1)\
        .write.parquet(d)
    DV.delete_where_dv(spark, d, F.col("k") < 40)
    dv_tables.append(d)

    quiet_streak, history = 0, []
    for sweep in range(8):
        report = M.run_maintenance(
            spark, dv_paths=dv_tables, table_paths=tables, policy=policy
        )
        acts = [r["action"] for r in report]
        errs = [r.get("error") for r in report if r.get("error")]
        assert not errs, (sweep, errs, history)
        history.append(acts)
        if all(a is None for a in acts):
            quiet_streak += 1
            if quiet_streak == 2:
                break
        else:
            quiet_streak = 0
    assert quiet_streak == 2, (
        f"fleet never quiesced within 8 sweeps: {history}"
    )
    # quiescence is not emptiness: every table still reads in full
    for t in tables:
        assert versioned.read_current(spark, t).count() > 0


def test_decide_table_snapshot_refs_survive_json_round_trip():
    """ADVICE r18 #1: a detail dict that round-tripped through JSON
    carries STRING version keys in snapshot_refs; pricing must still
    see the drop set (the raw-key refs.get(int) lookup silently priced
    every reclaim as 0 and vacuum never dispatched)."""
    import json as _json

    detail = {
        "size_bytes": 1000, "superseded_bytes": 0, "intent": None,
        "retained_versions": [0, 1, 2, 3],
        "snapshot_refs": {0: ["a"], 1: ["a", "b"], 2: ["c"], 3: ["c"],
                          4: ["c"]},
        "data_file_bytes": {"a": 600, "b": 100, "c": 300},
    }
    assert M.decide_table(detail) == "vacuum"
    rt = _json.loads(_json.dumps(detail))
    assert M.decide_table(rt) == "vacuum"
    # and a drop set whose files all survive in kept versions stays None
    shared = {**detail, "snapshot_refs": {0: ["c"], 1: ["c"], 2: ["c"],
                                          3: ["c"], 4: ["c"]}}
    assert M.decide_table(_json.loads(_json.dumps(shared))) is None
