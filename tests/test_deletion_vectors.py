"""Deletion vectors: merge-on-read deletes, untouched data files, purge."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from medallion_data_warehouse_on_azure_with_databricks_pyspark_spark.sources import deletion_vectors as DV

from .conftest import SF_DIR


def _data_files(path):
    out = []
    for root, dirs, files in os.walk(path):
        dirs[:] = [d for d in dirs if not d.startswith(("_", "."))]
        out += [os.path.join(root, f) for f in files if f.endswith(".parquet")]
    return sorted(out)


@pytest.fixture()
def table(spark, tmp_path):
    t = str(tmp_path / "part")
    spark.read.parquet(f"{SF_DIR}/part.parquet").repartition(4).write.parquet(t)
    return t


def test_dv_delete_leaves_data_files_untouched(spark, table):
    before = [(f, os.path.getsize(f), os.path.getmtime(f)) for f in _data_files(table)]
    n = DV.delete_where_dv(spark, table, F.col("p_type") == "PROMO")
    assert n > 0
    after = [(f, os.path.getsize(f), os.path.getmtime(f)) for f in _data_files(table)]
    assert before == after  # merge-on-read: no data rewrite
    got = DV.read_dv(spark, table)
    assert got.where(F.col("p_type") == "PROMO").count() == 0
    assert got.count() == spark.read.parquet(table).where("p_type <> 'PROMO'").count()


def test_dv_deletes_compose_and_second_scan_sees_logical_table(spark, table):
    n1 = DV.delete_where_dv(spark, table, F.col("p_type") == "PROMO")
    # second delete's predicate scan must not re-match already-deleted rows
    n2 = DV.delete_where_dv(spark, table, F.col("p_size") > 40)
    assert n1 > 0 and n2 > 0
    raw = spark.read.parquet(table)
    overlap = raw.where((F.col("p_type") == "PROMO") & (F.col("p_size") > 40)).count()
    assert overlap > 0  # the composition case is actually exercised
    assert n1 + n2 == raw.where("p_type = 'PROMO' OR p_size > 40").count()
    assert DV.read_dv(spark, table).count() == raw.where(
        "NOT (p_type = 'PROMO' OR p_size > 40)"
    ).count()


def test_dv_mark_count_dedupes(spark, table):
    DV.delete_where_dv(spark, table, F.col("p_type") == "PROMO")
    assert DV.delete_where_dv(spark, table, F.col("p_type") == "PROMO") == 0
    assert DV.dv_mark_count(spark, table) == spark.read.parquet(table).where(
        "p_type = 'PROMO'"
    ).count()


def test_purge_materializes_and_clears_marks(spark, table):
    DV.delete_where_dv(spark, table, F.col("p_type") == "PROMO")
    want = DV.read_dv(spark, table).count()
    purged = DV.purge_dv(spark, table)
    assert purged > 0
    assert DV.dv_mark_count(spark, table) == 0
    # physical == logical after purge
    assert spark.read.parquet(table).count() == want
    assert DV.read_dv(spark, table).count() == want
    assert DV.purge_dv(spark, table) == 0  # idempotent


def test_read_dv_without_marks_is_plain_scan(spark, table):
    assert DV.read_dv(spark, table).count() == spark.read.parquet(table).count()
    assert DV.read_dv(spark, table).columns == spark.read.parquet(table).columns
