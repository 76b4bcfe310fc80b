"""CONVERT TO DELTA / CLONE parity (r17): in-place adoption of plain
parquet as a versioned table, and zero-copy snapshot clones with
independent histories."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from medallion_data_warehouse_on_azure_with_databricks_pyspark_spark.sources import (
    deletion_vectors as DV,
)
from medallion_data_warehouse_on_azure_with_databricks_pyspark_spark.sources import (
    versioned as V,
)

from .conftest import SF_DIR


def _xor_checksum(df, *cols):
    return df.agg(F.bit_xor(F.xxhash64(*cols)).alias("h")).first()["h"]


# ---------------------------------------------------------------------------
# CONVERT
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("mode", ["manifest", "physical"])
def test_convert_adopts_plain_parquet_in_place(spark, tmp_path, mode):
    t = str(tmp_path / "t")
    src = spark.read.parquet(f"{SF_DIR}/part.parquet")
    src.repartition(4).write.parquet(t)
    before = sorted(
        (os.path.relpath(f, t), os.path.getsize(f), os.path.getmtime(f))
        for f in V._data_files(t)
    )
    assert V.convert_to_versioned(spark, t, snapshot_mode=mode, now=1.0) == 0
    # zero-copy adoption: the data files are byte-identical and unmoved
    after = sorted(
        (os.path.relpath(f, t), os.path.getsize(f), os.path.getmtime(f))
        for f in V._data_files(t)
    )
    assert before == after
    assert V.current_version(t) == 0
    assert V.snapshot_mode(t) == mode
    got = V.read_current(spark, t)
    assert got.count() == src.count()
    assert _xor_checksum(got, "p_partkey", "p_size") == _xor_checksum(
        src, "p_partkey", "p_size"
    )
    (entry,) = V.history(t)
    assert entry["operation"] == "CONVERT"
    assert entry["metadata"]["adopted_files"] == len(before)


def test_convert_then_versioned_ops_and_time_travel(spark, tmp_path):
    t = str(tmp_path / "t")
    src = spark.read.parquet(f"{SF_DIR}/part.parquet")
    src.repartition(4).write.parquet(t)
    V.convert_to_versioned(spark, t, now=1.0, stats_columns=["p_partkey"])
    from medallion_data_warehouse_on_azure_with_databricks_pyspark_spark.sources import (
        skipping,
    )

    assert os.path.isdir(os.path.join(t, skipping.STATS_DIR))
    extra = src.limit(5).withColumn("p_partkey", F.col("p_partkey") + 10**9)
    V.append_versioned(extra, t, now=2.0)
    assert V.read_current(spark, t).count() == src.count() + 5
    # v0 time travel returns exactly the adopted snapshot
    assert V.read_version(spark, t, 0).count() == src.count()


def test_convert_refusals(spark, tmp_path):
    t = str(tmp_path / "t")
    spark.read.parquet(f"{SF_DIR}/part.parquet").coalesce(1).write.parquet(t)
    V.convert_to_versioned(spark, t, now=1.0)
    with pytest.raises(ValueError, match="already a versioned table"):
        V.convert_to_versioned(spark, t)
    # empty dir
    e = str(tmp_path / "empty")
    os.makedirs(e)
    with pytest.raises(ValueError, match="no parquet data files"):
        V.convert_to_versioned(spark, e)
    # live DV sidecar: adopted v0 would resurrect marked rows
    d = str(tmp_path / "dv")
    spark.read.parquet(f"{SF_DIR}/part.parquet").coalesce(1).write.parquet(d)
    DV.delete_where_dv(spark, d, F.col("p_type") == "PROMO")
    with pytest.raises(ValueError, match="deletion-vector"):
        V.convert_to_versioned(spark, d)


def test_convert_crash_rolls_forward(spark, tmp_path):
    """A convert that died after journaling its intent but before the
    log append completes on recover() — the standard roll-forward."""
    t = str(tmp_path / "t")
    spark.read.parquet(f"{SF_DIR}/part.parquet").coalesce(2).write.parquet(t)
    files = sorted(os.path.relpath(f, t) for f in V._data_files(t))
    V._claim_intent(t, {"op": "convert"})
    V._set_snapshot_mode(t, "manifest")
    entry = {
        "version": 0, "committed_at": 1.0, "operation": "CONVERT",
        "metadata": {"adopted_files": len(files)},
        "add": files, "remove": [],
        "schema": spark.read.parquet(t).schema.json(),
    }
    V._write_intent(t, {"stage": f"{t}.__stage_convert", "entry": entry,
                        "moves": []})
    assert V.recover(t) is True
    assert V.current_version(t) == 0
    assert V.read_current(spark, t).count() == spark.read.parquet(
        f"{SF_DIR}/part.parquet"
    ).count()


# ---------------------------------------------------------------------------
# CLONE
# ---------------------------------------------------------------------------

@pytest.fixture()
def vtable(spark, tmp_path):
    t = str(tmp_path / "src")
    part = spark.read.parquet(f"{SF_DIR}/part.parquet")
    V.overwrite_versioned(part.repartition(4), t, now=1.0,
                          snapshot_mode="manifest",
                          stats_columns=["p_partkey"])
    V.append_versioned(
        part.limit(7).withColumn("p_partkey", F.col("p_partkey") + 10**9),
        t, now=2.0,
    )
    return t


def test_clone_is_zero_copy_and_independent(spark, tmp_path, vtable):
    dst = str(tmp_path / "dst")
    assert V.clone_table(vtable, dst, now=3.0) == 0
    src_df = V.read_current(spark, vtable)
    dst_df = V.read_current(spark, dst)
    assert dst_df.count() == src_df.count()
    assert _xor_checksum(dst_df, "p_partkey", "p_size") == _xor_checksum(
        src_df, "p_partkey", "p_size"
    )
    # zero-copy: every cloned file shares its source inode (hardlink)
    src_inodes = {os.path.basename(f): os.stat(f).st_ino
                  for f in V._live_data_files(vtable)}
    for f in V._live_data_files(dst):
        assert os.stat(f).st_ino == src_inodes[os.path.basename(f)]
    # fresh lineage-bearing history
    (entry,) = V.history(dst)
    assert entry["operation"] == f"CLONE({vtable}@v1)"
    assert entry["metadata"]["source_table"] == vtable
    assert entry["metadata"]["source_version"] == 1
    # divergence: a write to the clone never reaches the source
    n0 = src_df.count()
    V.delete_where(spark, dst, F.col("p_partkey") >= 10**9, now=4.0)
    assert V.read_current(spark, dst).count() == n0 - 7
    assert V.read_current(spark, vtable).count() == n0
    # ...and vice versa
    V.append_versioned(src_df.limit(3), vtable, now=5.0)
    assert V.read_current(spark, vtable).count() == n0 + 3
    assert V.read_current(spark, dst).count() == n0 - 7


def test_clone_version_as_of_and_deep(spark, tmp_path, vtable):
    old = str(tmp_path / "old")
    V.clone_table(vtable, old, version=0, now=3.0)
    assert V.read_current(spark, old).count() == V.read_version(
        spark, vtable, 0
    ).count()
    deep = str(tmp_path / "deep")
    V.clone_table(vtable, deep, deep=True, now=3.0)
    src_inodes = {os.stat(f).st_ino for f in V._live_data_files(vtable)}
    for f in V._live_data_files(deep):
        assert os.stat(f).st_ino not in src_inodes  # real byte copies
    assert V.read_current(spark, deep).count() == V.read_current(
        spark, vtable
    ).count()


def test_clone_survives_source_vacuum(spark, tmp_path, vtable):
    """Hardlinked inodes keep the clone readable even after the source
    vacuums / rewrites away the shared files."""
    dst = str(tmp_path / "dst")
    V.clone_table(vtable, dst, now=3.0)
    n = V.read_current(spark, dst).count()
    part = spark.read.parquet(f"{SF_DIR}/part.parquet")
    V.overwrite_versioned(part.limit(1), vtable, now=4.0)
    V.vacuum(vtable, keep_last=0)
    assert V.read_current(spark, vtable).count() == 1
    assert V.read_current(spark, dst).count() == n  # untouched


def test_clone_carries_properties_and_refuses_existing_target(
    spark, tmp_path, vtable
):
    V.set_clustering(spark, vtable, ["p_partkey"], curve="sorted")
    V.set_constraints(vtable, {"positive_size": "p_size >= 0"})
    dst = str(tmp_path / "dst")
    V.clone_table(vtable, dst, now=3.0)
    assert V.clustering_of(dst) == {"cols": ["p_partkey"], "curve": "sorted"}
    assert V.get_constraints(dst) == {"positive_size": "p_size >= 0"}
    # the carried CHECK constraint enforces on the clone's own commits
    bad = V.read_current(spark, dst).limit(1).withColumn(
        "p_size", F.lit(-1)
    )
    with pytest.raises(Exception, match="positive_size"):
        V.append_versioned(bad, dst, now=4.0)
    # skipping self-heal hint carried from the source's stats manifest
    with open(V._stats_hint_path(dst)) as fh:
        assert json.load(fh)["stats_columns"] == ["p_partkey"]
    with pytest.raises(ValueError, match="already exists"):
        V.clone_table(vtable, dst)


def test_convert_adopts_hive_partitioned_layout(spark, tmp_path):
    """Adopted files under hive dirs keep their partition column through
    log-resolved reads, and partition-scoped commits work post-adoption."""
    t = str(tmp_path / "t")
    df = spark.range(4_000).select(
        (F.col("id") % 4).cast("int").alias("g"), F.col("id").alias("v")
    )
    df.write.partitionBy("g").parquet(t)
    V.convert_to_versioned(spark, t, now=1.0)
    got = V.read_current(spark, t)
    assert set(got.columns) == {"g", "v"}
    assert got.groupBy("g").count().count() == 4
    assert got.count() == 4_000
    # a partition-scoped replace commits on the adopted v0
    b1 = got.filter(F.col("g") == 1).withColumn("v", F.col("v") + 100)
    V.replace_partitions(b1, t, "g", expected_version=0, now=2.0)
    out = V.read_current(spark, t)
    assert out.count() == 4_000
    assert out.filter("g = 1 AND v < 100").count() == 0


def test_clone_physical_mode_table(spark, tmp_path):
    """clone_table on a PHYSICAL-mode source (current snapshot plain at
    the path, retention dirs aside): same zero-copy + divergence
    contract, including a version-pinned clone from a retention dir."""
    src = str(tmp_path / "src")
    part = spark.read.parquet(f"{SF_DIR}/part.parquet")
    V.overwrite_versioned(part.repartition(2), src, now=1.0)  # physical
    V.overwrite_versioned(part.limit(100), src, now=2.0)
    assert V.snapshot_mode(src) == "physical"
    dst = str(tmp_path / "dst")
    V.clone_table(src, dst, now=3.0)
    assert V.snapshot_mode(dst) == "physical"
    assert V.read_current(spark, dst).count() == 100
    # version-pinned clone resolves the retention dir
    old = str(tmp_path / "old")
    V.clone_table(src, old, version=0, now=3.0)
    assert V.read_current(spark, old).count() == part.count()
    # divergence: append to the clone, source untouched
    V.append_versioned(part.limit(3), dst, now=4.0)
    assert V.read_current(spark, dst).count() == 103
    assert V.read_current(spark, src).count() == 100
