"""Delta-style time travel on the parquet lane: version reads, timestamp
reads, history, restore-as-new-version, vacuum retention."""

from __future__ import annotations

import os

import pytest

from medallion_data_warehouse_on_azure_with_databricks_pyspark_spark.sources import (
    versioned as V,
)


def _ids(df):
    return sorted(r["id"] for r in df.collect())


@pytest.fixture()
def table(spark, tmp_path):
    path = str(tmp_path / "tbl")
    for n, ts in ((2, 100.0), (4, 200.0), (6, 300.0)):
        df = spark.range(n).withColumnRenamed("id", "id_tmp").selectExpr(
            "id_tmp as id"
        )
        V.overwrite_versioned(df, path, now=ts)
    return path


def test_version_reads_and_current(spark, table):
    assert V.current_version(table) == 2
    assert _ids(V.read_version(spark, table, 0)) == [0, 1]
    assert _ids(V.read_version(spark, table, 1)) == [0, 1, 2, 3]
    assert _ids(V.read_version(spark, table, 2)) == list(range(6))
    # the CURRENT data stays plain parquet at the table path
    assert _ids(spark.read.parquet(table)) == list(range(6))


def test_timestamp_as_of(spark, table):
    assert _ids(V.read_as_of(spark, table, 150.0)) == [0, 1]
    assert _ids(V.read_as_of(spark, table, 200.0)) == [0, 1, 2, 3]  # inclusive
    assert _ids(V.read_as_of(spark, table, 9e9)) == list(range(6))
    with pytest.raises(ValueError, match="no version committed"):
        V.read_as_of(spark, table, 50.0)


def test_history_newest_first(spark, table):
    h = V.history(table)
    assert [e["version"] for e in h] == [2, 1, 0]
    assert [e["committed_at"] for e in h] == [300.0, 200.0, 100.0]


def test_restore_appends_new_version(spark, table):
    v = V.restore(spark, table, 0, now=400.0)
    assert v == 3
    assert _ids(spark.read.parquet(table)) == [0, 1]
    h = V.history(table)
    assert h[0]["operation"] == "RESTORE(v0)"
    # the pre-restore state is itself retained
    assert _ids(V.read_version(spark, table, 2)) == list(range(6))


def test_vacuum_drops_data_keeps_history(spark, table):
    dropped = V.vacuum(table, keep_last=1)
    assert dropped == [0]
    assert [e["version"] for e in V.history(table)] == [2, 1, 0]
    with pytest.raises(ValueError, match="vacuumed"):
        V.read_version(spark, table, 0)
    assert _ids(V.read_version(spark, table, 1)) == [0, 1, 2, 3]


def test_unknown_version_raises(spark, table):
    with pytest.raises(ValueError, match="unknown version"):
        V.read_version(spark, table, 9)


def test_partitioned_versioned_overwrite(spark, tmp_path):
    path = str(tmp_path / "ptbl")
    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "a")], "id long, part string"
    )
    V.overwrite_versioned(df, path, partition_by=["part"], now=1.0)
    assert os.path.isdir(os.path.join(path, "part=a"))
    V.overwrite_versioned(df.filter("part = 'a'"), path,
                          partition_by=["part"], now=2.0)
    assert _ids(V.read_version(spark, path, 0)) == [1, 2, 3]
    assert _ids(spark.read.parquet(path)) == [1, 3]
