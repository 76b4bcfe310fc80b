"""Manifest-based virtual snapshots (round 12 — VERDICT r11 ask #2).

The behavioral contract of ``sources/versioned.py`` re-verified in
``snapshot_mode="manifest"``: commits record add/remove file ACTIONS in
the log instead of assembling physical snapshot directories, so a
partition replace costs O(changed files) — never the O(live files)
hardlink walk.  ``tests/test_versioned.py`` keeps covering the physical
mode (its crash simulations and inode assertions are physical-layout
internals with no manifest analogue); this module mirrors every
mode-agnostic behavior on the manifest lane and adds the manifest-only
properties (no link walk, files-checkpoint replay, live-set vacuum).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from medallion_data_warehouse_on_azure_with_databricks_pyspark_spark.sources import (
    skipping as S,
)
from medallion_data_warehouse_on_azure_with_databricks_pyspark_spark.sources import (
    versioned as V,
)


def _ids(df):
    return sorted(r["id"] for r in df.collect())


def _disk_files(path):
    out = []
    for root, dirs, files in os.walk(path):
        dirs[:] = [d for d in dirs if not d.startswith(("_", "."))]
        out += [
            os.path.relpath(os.path.join(root, f), path)
            for f in files
            if f.endswith(".parquet") and not f.startswith(("_", "."))
        ]
    return sorted(out)


@pytest.fixture()
def table(spark, tmp_path):
    path = str(tmp_path / "tbl")
    for n, ts in ((2, 100.0), (4, 200.0), (6, 300.0)):
        V.overwrite_versioned(
            spark.range(n).selectExpr("id as id"), path, now=ts,
            snapshot_mode="manifest",
        )
    return path


def test_mode_persisted_and_conflicting_mode_refused(spark, table):
    assert V.snapshot_mode(table) == "manifest"
    with pytest.raises(ValueError, match="cannot change"):
        V.overwrite_versioned(spark.range(1), table, snapshot_mode="physical")
    # omitting the mode on later commits inherits it
    V.overwrite_versioned(spark.range(1), table, now=400.0)
    assert V.snapshot_mode(table) == "manifest"


def test_version_reads_and_current(spark, table):
    assert V.current_version(table) == 2
    assert _ids(V.read_version(spark, table, 0)) == [0, 1]
    assert _ids(V.read_version(spark, table, 1)) == [0, 1, 2, 3]
    assert _ids(V.read_version(spark, table, 2)) == list(range(6))
    assert _ids(V.read_current(spark, table)) == list(range(6))
    # the root accumulates files by design; snapshots never double-read
    assert len(_disk_files(table)) >= 3


def test_timestamp_as_of(spark, table):
    assert _ids(V.read_as_of(spark, table, 150.0)) == [0, 1]
    assert _ids(V.read_as_of(spark, table, 200.0)) == [0, 1, 2, 3]
    assert _ids(V.read_as_of(spark, table, 9e9)) == list(range(6))
    with pytest.raises(ValueError, match="no version committed"):
        V.read_as_of(spark, table, 50.0)


def test_history_restore_and_unknown_version(spark, table):
    assert [e["version"] for e in V.history(table)] == [2, 1, 0]
    v = V.restore(spark, table, 0, now=400.0)
    assert v == 3
    assert _ids(V.read_current(spark, table)) == [0, 1]
    assert V.history(table)[0]["operation"] == "RESTORE(v0)"
    assert _ids(V.read_version(spark, table, 2)) == list(range(6))
    with pytest.raises(ValueError, match="unknown version"):
        V.read_version(spark, table, 9)


def test_vacuum_drops_data_keeps_history(spark, table):
    dropped = V.vacuum(table, keep_last=1)
    assert dropped == [0]
    assert [e["version"] for e in V.history(table)] == [2, 1, 0]
    with pytest.raises(ValueError, match="vacuumed"):
        V.read_version(spark, table, 0)
    assert _ids(V.read_version(spark, table, 1)) == [0, 1, 2, 3]
    assert _ids(V.read_current(spark, table)) == list(range(6))


def test_vacuum_keeps_files_shared_with_protected_versions(spark, tmp_path):
    """A file referenced by BOTH a vacuumed and a protected version must
    survive (action-log reference counting, the inode-sharing analogue)."""
    path = str(tmp_path / "shared")
    df = spark.createDataFrame(
        [(g, i) for g in range(2) for i in range(3)], "g int, v int"
    )
    V.overwrite_versioned(df, path, partition_by=["g"], now=0.0,
                          snapshot_mode="manifest")
    new = spark.createDataFrame([(1, 99)], "g int, v int")
    V.replace_partitions(new, path, "g", expected_version=0, now=1.0)
    # v0 shares its g=0 files with v1 (current)
    assert V.vacuum(path, keep_last=0) == [0]
    got = V.read_current(spark, path)
    assert got.filter("g = 0").count() == 3  # shared files intact
    assert got.filter("g = 1").count() == 1
    with pytest.raises(ValueError, match="vacuumed"):
        V.read_version(spark, path, 0)


def test_partitioned_overwrite_and_partition_columns_survive(spark, tmp_path):
    path = str(tmp_path / "ptbl")
    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "a")], "id long, part string"
    )
    V.overwrite_versioned(df, path, partition_by=["part"], now=1.0,
                          snapshot_mode="manifest")
    V.overwrite_versioned(df.filter("part = 'a'"), path,
                          partition_by=["part"], now=2.0)
    assert _ids(V.read_version(spark, path, 0)) == [1, 2, 3]
    cur = V.read_current(spark, path)
    assert _ids(cur) == [1, 3]
    assert set(cur.columns) == {"id", "part"}  # hive column reconstructed
    assert {r.part for r in cur.collect()} == {"a"}


def test_table_changes_all_row_classes(spark, tmp_path):
    path = str(tmp_path / "cdf")
    V.overwrite_versioned(
        spark.createDataFrame(
            [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
            "id long, name string, val double",
        ), path, now=1.0, snapshot_mode="manifest",
    )
    V.overwrite_versioned(
        spark.createDataFrame(
            [(2, "b", 20.0), (3, "C", 30.0), (4, "d", 40.0)],
            "id long, name string, val double",
        ), path, now=2.0,
    )
    rows = {
        (r["id"], r["_change_type"])
        for r in V.table_changes(spark, path, ["id"], 0, 1).collect()
    }
    assert rows == {
        (1, "delete"), (3, "update_preimage"),
        (3, "update_postimage"), (4, "insert"),
    }


def test_delete_update_and_constraints(spark, tmp_path):
    from medallion_data_warehouse_on_azure_with_databricks_pyspark_spark.plans.expectations import (
        ExpectationError,
    )

    path = str(tmp_path / "dml")
    V.overwrite_versioned(
        spark.range(1, 11).withColumnRenamed("id", "k"), path, now=1.0,
        snapshot_mode="manifest",
    )
    V.set_constraints(path, {"positive_k": "k > 0"})
    with pytest.raises(ExpectationError, match="positive_k"):
        V.update_where(spark, path, F.col("k") == 1, {"k": F.lit(-1)}, now=2.0)
    assert V.current_version(path) == 0
    V.delete_where(spark, path, F.col("k") == 10, now=3.0)
    V.update_where(spark, path, F.col("k") == 1, {"k": F.lit(101)}, now=4.0)
    got = sorted(r.k for r in V.read_current(spark, path).collect())
    assert got == [2, 3, 4, 5, 6, 7, 8, 9, 101]
    assert [e["operation"] for e in V.history(path)] == [
        "UPDATE", "DELETE", "WRITE",
    ]


def test_optimize_compact_preserves_data_layout_history(spark, tmp_path):
    path = str(tmp_path / "opt")
    df = (spark.range(0, 300)
          .withColumn("bucket", (F.col("id") % 3).cast("string"))
          .withColumnRenamed("id", "k"))
    V.overwrite_versioned(df.repartition(4), path, partition_by=["bucket"],
                          now=1.0, snapshot_mode="manifest")
    n_before = len(V._live_data_files(path))
    assert n_before > 3
    V.optimize_compact(spark, path, target_file_bytes=64 * 1024 * 1024, now=2.0)
    assert len(V._live_data_files(path)) < n_before
    assert V.read_current(spark, path).count() == 300
    assert V.read_version(spark, path, 0).count() == 300
    assert V.history(path)[0]["operation"] == "OPTIMIZE"
    # layout preserved: every live file sits under a bucket= dir
    assert all(
        os.path.relpath(f, path).startswith("bucket=")
        for f in V._live_data_files(path)
    )


def _mk_parts(spark, path):
    df = spark.createDataFrame(
        [(g, i, g * 100 + i) for g in range(4) for i in range(5)],
        "g int, i int, v int",
    )
    V.overwrite_versioned(df, path, partition_by=["g"], now=0.0,
                          snapshot_mode="manifest")
    return df


def test_replace_partitions_never_walks_untouched_files(spark, tmp_path, monkeypatch):
    """THE scale property: a manifest-mode partition commit must not
    link, list-copy, or rename a single untouched file — _link_tree is
    the physical lane's assembly primitive and must never run."""
    path = str(tmp_path / "t")
    _mk_parts(spark, path)

    def boom(*a, **k):  # pragma: no cover - failing is the assertion
        raise AssertionError("manifest commit walked untouched files")

    monkeypatch.setattr(V, "_link_tree", boom)
    before = set(_disk_files(path))
    new = spark.createDataFrame(
        [(2, 0, 777)], "g int, i int, v int"
    )
    V.replace_partitions(new, path, "g", expected_version=0, now=1.0)
    after = set(_disk_files(path))
    added = after - before
    # on-disk delta is exactly the staged files; nothing else moved
    assert added and all(f.startswith("g=2/") for f in added)
    assert before <= after  # old files still present (until vacuum)
    got = V.read_current(spark, path)
    assert got.filter("g = 2").count() == 1
    assert got.filter("g = 0").count() == 5
    assert V.read_version(spark, path, 0).filter("g = 2").count() == 5


def test_replace_partitions_disjoint_commute_and_overlap_conflict(spark, tmp_path):
    path = str(tmp_path / "t")
    _mk_parts(spark, path)
    a = spark.createDataFrame([(1, 0, 9001)], "g int, i int, v int")
    b = spark.createDataFrame([(2, 0, 9002)], "g int, i int, v int")
    va = V.replace_partitions(a, path, "g", expected_version=0, now=1.0)
    vb = V.replace_partitions(b, path, "g", expected_version=0, now=2.0)
    assert (va, vb) == (1, 2)  # disjoint: both land without retry
    got = V.read_current(spark, path)
    assert {r.v for r in got.filter("g = 1").collect()} == {9001}
    assert {r.v for r in got.filter("g = 2").collect()} == {9002}
    assert got.filter("g = 0").count() == 5
    with pytest.raises(V.ConcurrentWriteError, match="does not commute"):
        V.replace_partitions(a, path, "g", expected_version=0, now=3.0)
    # pinned to v1, the only intervening commit (v2, g=2) is disjoint
    # from a's g=1 — commutes, lands at v3
    assert V.replace_partitions(a, path, "g", expected_version=1, now=4.0) == 3
    # a full-table overwrite rival conflicts with any stale-pinned replace
    df = V.read_current(spark, path)
    V.overwrite_versioned(df, path, partition_by=["g"], now=5.0)  # v4
    with pytest.raises(V.ConcurrentWriteError, match="does not commute"):
        V.replace_partitions(b, path, "g", expected_version=3, now=6.0)


def test_transact_partitions_retries_only_on_real_conflict(spark, tmp_path):
    path = str(tmp_path / "t")
    _mk_parts(spark, path)
    rival = spark.createDataFrame([(2, 0, 1)], "g int, i int, v int")
    V.replace_partitions(rival, path, "g", expected_version=0, now=1.0)
    calls = []

    def bump_g1(snap):
        calls.append(1)
        return snap.filter("g = 1").withColumn("v", F.col("v") + 1000)

    v = V.transact_partitions(spark, path, "g", bump_g1, now=2.0)
    assert v == 2 and len(calls) == 1  # commuting rival costs no retry
    got = V.read_current(spark, path)
    assert {r.v for r in got.filter("g = 1").collect()} == {
        1100, 1101, 1102, 1103, 1104
    }


def test_recover_rolls_manifest_commit_forward_from_any_step(spark, tmp_path):
    """Crash after the intent journal but before (or mid-way through) the
    per-file publishes: recover() finishes the moves and the log append."""
    path = str(tmp_path / "crash")
    V.overwrite_versioned(spark.range(3), path, now=1.0,
                          snapshot_mode="manifest")
    stage = f"{path}.__stage_crashsim"
    spark.range(5).write.parquet(stage)
    moves = V._plan_moves(stage, 1)
    entry = {
        "version": 1, "committed_at": 2.0, "operation": "WRITE",
        "add": sorted(d for _, d in moves),
        "remove": V._snapshot_files(path, 0),
        "schema": spark.range(5).schema.json(),
    }
    V._write_intent(path, {"stage": stage, "entry": entry, "moves": moves})
    # crash BEFORE any move: table still serves v0
    assert V.current_version(path) == 0
    assert V.recover(path) is True
    assert V.current_version(path) == 1
    assert V.read_current(spark, path).count() == 5
    assert V.read_version(spark, path, 0).count() == 3
    # next commit lands normally
    assert V.overwrite_versioned(spark.range(7), path, now=3.0) == 2
    assert V.recover(path) is False  # idempotent when healthy

    # crash MID-publish: half the moves applied
    path2 = str(tmp_path / "crash2")
    V.overwrite_versioned(spark.range(3), path2, now=1.0,
                          snapshot_mode="manifest")
    stage2 = f"{path2}.__stage_crashsim2"
    spark.range(8).repartition(2).write.parquet(stage2)
    moves2 = V._plan_moves(stage2, 1)
    assert len(moves2) >= 2
    entry2 = {
        "version": 1, "committed_at": 2.0, "operation": "WRITE",
        "add": sorted(d for _, d in moves2),
        "remove": V._snapshot_files(path2, 0),
        "schema": spark.range(8).schema.json(),
    }
    V._write_intent(path2, {"stage": stage2, "entry": entry2, "moves": moves2})
    src, dst = moves2[0]
    os.replace(os.path.join(stage2, src), os.path.join(path2, dst))
    assert V.recover(path2) is True
    assert V.read_current(spark, path2).count() == 8
    assert V.read_version(spark, path2, 0).count() == 3


def test_recover_claim_only_rolls_back(spark, tmp_path):
    path = str(tmp_path / "claimonly")
    V.overwrite_versioned(spark.range(3), path, now=1.0,
                          snapshot_mode="manifest")
    os.makedirs(f"{path}.__stage_orphan")
    V._claim_intent(path, {"stage": f"{path}.__stage_orphan"})
    assert V.recover(path) is False
    assert not os.path.exists(f"{path}.__stage_orphan")
    assert V.read_current(spark, path).count() == 3
    assert V.overwrite_versioned(spark.range(5), path, now=2.0) == 1


def test_skipping_manifests_maintained_across_manifest_replace(spark, tmp_path):
    """Stats AND bloom manifests must describe exactly the live set after
    a manifest-mode partition replace — stale files share the touched
    dirs here, so the rescan must be pinned to live files."""
    path = str(tmp_path / "skip")
    df = spark.createDataFrame(
        [(g, f"k{g}_{i}", g * 10 + i) for g in range(3) for i in range(4)],
        "g int, key string, v int",
    )
    V.overwrite_versioned(df, path, partition_by=["g"], now=0.0,
                          snapshot_mode="manifest")
    S.write_stats_manifest(spark, path, ["v"],
                           files=V._live_data_files(path))
    S.write_bloom_manifest(spark, path, "key",
                           files=V._live_data_files(path))
    new = spark.createDataFrame(
        [(1, "fresh_a", 500), (1, "fresh_b", 501)], "g int, key string, v int"
    )
    V.replace_partitions(new, path, "g", expected_version=0, now=1.0)
    # stats: wide-open pruned scan == live table; range prune finds v>=500
    got = sorted((r.g, r.v) for r in S.read_skipping(spark, path, "v").collect())
    want = sorted(
        (r.g, r.v) for r in V.read_current(spark, path).collect()
    )
    assert got == want
    kept, total = S.pruned_files(spark, path, "v", lower=500)
    assert 0 < len(kept) < total
    # manifest rows reference live files only
    man = S.read_stats_manifest(spark, path)
    live = {os.path.relpath(f, path) for f in V._live_data_files(path)}
    for r in man.select("file_path").collect():
        p = r["file_path"].removeprefix("file://").removeprefix("file:")
        assert os.path.relpath(p, path) in live, p
    # bloom: new key prunes + exact; replaced key gone; untouched exact
    kept_b, total_b = S.bloom_pruned_files(spark, path, "key", "fresh_a")
    assert 0 < len(kept_b) < total_b
    assert S.read_bloom_skipping(spark, path, "key", "fresh_a").count() == 1
    assert S.read_bloom_skipping(spark, path, "key", "k1_0").count() == 0
    assert S.read_bloom_skipping(spark, path, "key", "k2_3").count() == 1


def test_clone_is_zero_copy_live_only_and_independent(spark, tmp_path):
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    V.overwrite_versioned(spark.range(100).withColumnRenamed("id", "k"), src,
                          now=1.0, snapshot_mode="manifest")
    V.overwrite_versioned(
        spark.range(50).withColumnRenamed("id", "k"), src, now=2.0
    )
    assert V.clone_table(src, dst, now=3.0) == 0
    assert V.snapshot_mode(dst) == "manifest"
    # the clone carries ONLY the live set (v1), not the stale v0 files
    assert V.read_current(spark, dst).count() == 50
    src_live = {os.path.relpath(f, src) for f in V._live_data_files(src)}
    dst_live = {os.path.relpath(f, dst) for f in V._live_data_files(dst)}
    assert dst_live == src_live
    for rel in dst_live:  # zero-copy: shared inodes
        assert (
            os.stat(os.path.join(dst, rel)).st_ino
            == os.stat(os.path.join(src, rel)).st_ino
        )
    # divergence is isolated both ways
    V.delete_where(spark, dst, F.col("k") >= 25, now=4.0)
    assert V.read_current(spark, dst).count() == 25
    assert V.read_current(spark, src).count() == 50
    V.vacuum(dst, keep_last=0)
    assert V.read_current(spark, src).count() == 50


def test_files_checkpoint_bounds_snapshot_replay(spark, tmp_path):
    path = str(tmp_path / "ckpt")
    for i in range(25):
        V.overwrite_versioned(spark.range(i + 1), path, now=float(i),
                              snapshot_mode=("manifest" if i == 0 else None))
    ldir = V._log_dir(path)
    files_ckpts = sorted(f for f in os.listdir(ldir) if f.endswith(".files.json"))
    assert files_ckpts == [
        "00000000000000000010.files.json", "00000000000000000020.files.json",
    ]
    # resolution correctness across the checkpoint boundary
    assert V.read_version(spark, path, 7).count() == 8
    assert V.read_version(spark, path, 19).count() == 20
    assert V.read_version(spark, path, 24).count() == 25
    assert _ids(V.read_current(spark, path)) == list(range(25))


def test_empty_snapshot_reads_back_with_schema(spark, tmp_path):
    path = str(tmp_path / "empty")
    df = spark.createDataFrame([(1, "a")], "k int, s string")
    V.overwrite_versioned(df, path, now=1.0, snapshot_mode="manifest")
    V.overwrite_versioned(df.filter("k < 0"), path, now=2.0)  # empty commit
    cur = V.read_current(spark, path)
    assert cur.count() == 0
    assert set(cur.columns) == {"k", "s"}
    assert V.read_version(spark, path, 0).count() == 1


def test_table_detail_manifest_lifecycle(spark, tmp_path):
    path = str(tmp_path / "detail")
    V.overwrite_versioned(spark.range(100).withColumnRenamed("id", "k"),
                          path, now=1.0, snapshot_mode="manifest")
    V.update_where(spark, path, F.col("k") == 1, {"k": F.lit(101)}, now=2.0)
    V.delete_where(spark, path, F.col("k") > 100, now=3.0)
    V.vacuum(path, keep_last=1)
    d = V.table_detail(path)
    assert d["current_version"] == 2
    assert d["num_commits"] == 3
    assert d["retained_versions"] == [1]
    assert d["vacuumed_versions"] == [0]
    assert d["num_files"] == len(V._live_data_files(path))
    assert d["size_bytes"] > 0


def test_crashed_first_commit_retry_inherits_pinned_mode(spark, tmp_path):
    """A v0 writer that pinned the manifest marker and died before its
    intent leaves marker-without-log; a retry that omits snapshot_mode
    must INHERIT the pinned mode, not flip the layout under it."""
    path = str(tmp_path / "v0crash")
    V._set_snapshot_mode(path, "manifest")  # as the crashed v0 left it
    V.overwrite_versioned(spark.range(3), path, now=1.0)  # mode omitted
    assert V.snapshot_mode(path) == "manifest"
    assert V.read_current(spark, path).count() == 3
    log = V._read_log(path)
    assert "add" in log[0]  # committed as a manifest action entry


def test_tags_protect_manifest_versions_from_vacuum(spark, table):
    V.tag(table, "baseline", 0)
    dropped = V.vacuum(table, keep_last=0)
    assert dropped == [1]
    assert _ids(V.read_tag(spark, table, "baseline")) == [0, 1]
    with pytest.raises(ValueError, match="vacuumed"):
        V.read_version(spark, table, 1)
    V.delete_tag(table, "baseline")
    assert V.vacuum(table, keep_last=0) == [0]
    with pytest.raises(ValueError, match="vacuumed"):
        V.read_version(spark, table, 0)
    assert _ids(V.read_current(spark, table)) == list(range(6))


def test_merge_versioned_on_manifest_table(spark, tmp_path):
    """MERGE routes through transact -> read_current, so the transactional
    upsert/delete works unchanged on a manifest table, CDF included."""
    from medallion_data_warehouse_on_azure_with_databricks_pyspark_spark.plans import (
        merge as M,
    )

    path = str(tmp_path / "mrg")
    V.overwrite_versioned(
        spark.createDataFrame(
            [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
            "k int, name string, val double",
        ),
        path, now=1.0, snapshot_mode="manifest",
    )
    source = spark.createDataFrame(
        [(2, "b2", 25.0, False), (3, "c", 0.0, True), (4, "d", 40.0, False)],
        "k int, name string, val double, is_delete boolean",
    )
    v = M.merge_versioned(
        spark, path, source, keys=["k"], now=2.0,
        update_set={"name": M.s("name"), "val": M.s("val")},
        insert_values={"k": M.s("k"), "name": M.s("name"), "val": M.s("val")},
        delete_condition=M.s("is_delete"),
    )
    assert v == 1
    got = sorted(tuple(r) for r in V.read_current(spark, path).collect())
    assert got == [(1, "a", 10.0), (2, "b2", 25.0), (4, "d", 40.0)]
    chg = {
        (r["k"], r["_change_type"])
        for r in V.table_changes(spark, path, ["k"], 0, 1).collect()
    }
    assert chg == {
        (2, "update_preimage"), (2, "update_postimage"),
        (3, "delete"), (4, "insert"),
    }


def test_vacuum_refuses_while_commit_in_flight(spark, table):
    """ADVICE r12: a manifest commit publishes data files (_apply_moves)
    BEFORE the log entry references them; an unguarded concurrent vacuum
    would reap the mid-publish files and the committed version would
    permanently lose data.  Vacuum now takes the commit slot — a live
    intent (in-flight or crashed writer) makes it refuse loudly."""
    V._claim_intent(table, {"op": "write"})
    try:
        with pytest.raises(V.ConcurrentWriteError):
            V.vacuum(table, keep_last=0)
    finally:
        V._release_intent(table)
    # files untouched by the refused vacuum; a clean vacuum still works
    assert _ids(V.read_current(spark, table)) == list(range(6))
    V.vacuum(table, keep_last=0)
    assert _ids(V.read_current(spark, table)) == list(range(6))


def test_vacuum_releases_claim_so_commits_proceed(spark, table):
    V.vacuum(table, keep_last=0)
    V.overwrite_versioned(spark.range(8), table)  # claim was released
    assert _ids(V.read_current(spark, table)) == list(range(8))
