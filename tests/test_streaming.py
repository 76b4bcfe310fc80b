"""Streaming bronze ingest: exactly-once checkpointing, schema pinning,
incremental file discovery (SURVEY.md §2.9 invariant tests — oracle-free)."""

from __future__ import annotations

import os
import shutil

import pytest

from medallion_data_warehouse_on_azure_with_databricks_pyspark_spark.streaming import (
    bronze,
)

EVENTS = "/root/testdata/sf0.001/events.parquet"


@pytest.fixture()
def dirs(tmp_path):
    src = tmp_path / "source" / "events"
    src.mkdir(parents=True)
    shutil.copy(EVENTS, src / "part-000.parquet")
    return {
        "src": str(src),
        "bronze": str(tmp_path / "bronze" / "events"),
        "ckpt": str(tmp_path / "ckpt" / "events"),
    }


def test_ingest_exactly_once_and_incremental(spark, dirs):
    n_src = spark.read.parquet(dirs["src"]).count()

    bronze.ingest(spark, dirs["src"], dirs["bronze"], dirs["ckpt"])
    out = spark.read.parquet(dirs["bronze"])
    assert out.count() == n_src
    assert "_rescued_data" in out.columns
    assert out.filter(out["_rescued_data"].isNotNull()).count() == 0

    # Re-run with no new files → checkpoint prevents duplicates (ST2).
    bronze.ingest(spark, dirs["src"], dirs["bronze"], dirs["ckpt"])
    assert spark.read.parquet(dirs["bronze"]).count() == n_src

    # Drop a new file → only the delta is ingested (ST1).
    shutil.copy(EVENTS, os.path.join(dirs["src"], "part-001.parquet"))
    bronze.ingest(spark, dirs["src"], dirs["bronze"], dirs["ckpt"])
    assert spark.read.parquet(dirs["bronze"]).count() == 2 * n_src


def test_schema_pin_survives_capture_calls(spark, dirs):
    s1 = bronze.capture_schema(spark, dirs["src"], dirs["ckpt"] + "/_schema")
    s2 = bronze.capture_schema(spark, dirs["src"], dirs["ckpt"] + "/_schema")
    assert s1 == s2
    assert os.path.exists(os.path.join(dirs["ckpt"], "_schema", bronze.SCHEMA_FILE))


def test_dataset_fanout(spark, tmp_path):
    for ds in ("a", "b"):
        d = tmp_path / "source" / ds
        d.mkdir(parents=True)
        shutil.copy(EVENTS, d / "f.parquet")
    bronze.ingest_datasets(
        spark,
        [{"folder_name": "a"}, {"folder_name": "b"}],
        str(tmp_path / "source"), str(tmp_path / "bronze"), str(tmp_path / "ckpt"),
    )
    n = spark.read.parquet(EVENTS).count()
    assert spark.read.parquet(str(tmp_path / "bronze" / "a")).count() == n
    assert spark.read.parquet(str(tmp_path / "bronze" / "b")).count() == n
