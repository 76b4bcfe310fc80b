"""Partition-overwrite streaming sink: idempotent-by-construction
replay, revised re-delivery, checkpoint-incremental resume."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from medallion_data_warehouse_on_azure_with_databricks_pyspark_spark.sources import versioned as V
from medallion_data_warehouse_on_azure_with_databricks_pyspark_spark.streaming import (
    partition_stream as ps,
)


def _mk(spark, tmp_path, n=30):
    df = spark.createDataFrame(
        [(i, i % 3, i * 10) for i in range(n)], "id long, g int, v long"
    )
    landing = str(tmp_path / "landing")
    for g in range(3):
        df.filter(F.col("g") == g).coalesce(1).write.mode("append").parquet(
            landing
        )
    return df, landing


def test_partition_stream_lands_all_and_resumes_incrementally(spark, tmp_path):
    df, landing = _mk(spark, tmp_path)
    table = str(tmp_path / "t")
    ckpt = str(tmp_path / "ckpt")
    ps.partition_overwrite_ingest(
        spark, landing, table, ckpt, "g", df.schema, now=1.0
    )
    assert sorted(
        (r["id"], r["v"]) for r in spark.read.parquet(table).collect()
    ) == sorted((r["id"], r["v"]) for r in df.collect())
    v_after = V.current_version(table)
    # second run with NO new files: checkpoint means zero new commits
    ps.partition_overwrite_ingest(
        spark, landing, table, ckpt, "g", df.schema, now=2.0
    )
    assert V.current_version(table) == v_after
    # a NEW file for g=1 (revised content) is the only thing processed
    revised = spark.createDataFrame([(100, 1, -1)], "id long, g int, v long")
    revised.coalesce(1).write.mode("append").parquet(landing)
    ps.partition_overwrite_ingest(
        spark, landing, table, ckpt, "g", df.schema, now=3.0
    )
    got = spark.read.parquet(table)
    assert got.filter("g = 1").count() == 1
    assert got.filter("g = 1").first()["id"] == 100
    assert got.filter("g = 0").count() == 10  # untouched partitions intact
    assert got.filter("g = 2").count() == 10
    assert V.current_version(table) == v_after + 1


def test_partition_batch_replay_is_value_noop_and_empty_batch_skipped(
    spark, tmp_path
):
    df, _ = _mk(spark, tmp_path)
    table = str(tmp_path / "t")
    b0 = df.filter("g = 0")
    assert ps.apply_partition_batch(table, b0, "g", now=1.0) is True
    assert ps.apply_partition_batch(table, df.filter("g = 1"), "g", now=2.0)
    state = sorted(map(tuple, spark.read.parquet(table).collect()))
    # replay b0: a commit happens (history is honest) but the VALUE is
    # identical — idempotence comes from replacement, not a ledger
    assert ps.apply_partition_batch(table, b0, "g", now=3.0) is True
    assert sorted(map(tuple, spark.read.parquet(table).collect())) == state
    # empty batch: no commit at all
    v = V.current_version(table)
    empty = df.filter("g = 99")
    assert ps.apply_partition_batch(table, empty, "g", now=4.0) is False
    assert V.current_version(table) == v


def test_partition_stream_manifest_mode_end_to_end(spark, tmp_path):
    """The streaming sink composes with manifest snapshots: first batch
    pins the mode, later batches commit O(changed files) action entries;
    reads resolve through the log."""
    df, landing = _mk(spark, tmp_path)
    table = str(tmp_path / "t")
    ckpt = str(tmp_path / "ckpt")
    ps.partition_overwrite_ingest(
        spark, landing, table, ckpt, "g", df.schema, now=1.0,
        snapshot_mode="manifest",
    )
    assert V.snapshot_mode(table) == "manifest"
    got = V.read_current(spark, table)
    assert sorted((r["id"], r["v"]) for r in got.collect()) == sorted(
        (r["id"], r["v"]) for r in df.collect()
    )
    # every post-init commit is an add/remove action entry
    log = V._read_log(table)
    assert all("add" in e for e in log)
    # revised re-delivery replaces exactly its partition
    revised = spark.createDataFrame([(100, 1, -1)], "id long, g int, v long")
    revised.coalesce(1).write.mode("append").parquet(landing)
    ps.partition_overwrite_ingest(
        spark, landing, table, ckpt, "g", df.schema, now=2.0,
        snapshot_mode="manifest",
    )
    got = V.read_current(spark, table)
    assert got.filter("g = 1").count() == 1
    assert got.filter("g = 0").count() == 10
    # time travel back to the pre-revision snapshot still serves 10 rows
    assert V.read_version(spark, table, V.current_version(table) - 1).filter(
        "g = 1"
    ).count() == 10
