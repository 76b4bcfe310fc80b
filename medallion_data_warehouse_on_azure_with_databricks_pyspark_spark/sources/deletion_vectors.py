"""Deletion vectors: merge-on-read row-level deletes without rewriting data.

The copy-on-write DML in ``sources/versioned.py`` (``delete_where``)
rewrites the whole table per delete — correct, but at 100 TB a delete of
0.01% of rows costs a 100 TB write.  Delta's answer is deletion vectors
(also Iceberg v2 position deletes): record the POSITIONS of deleted rows
in a tiny sidecar and have readers subtract them, deferring the rewrite
to a background purge.  This module is that mechanism on the plain-
parquet lane:

* a row's physical id is ``(_metadata.file_path, _metadata.row_index)``
  — stable for immutable parquet files (row_index is the row's ordinal
  within its file, exposed by Spark's parquet reader);
* ``delete_where_dv`` appends the matching positions to
  ``<table>/_deletion_vectors/`` (underscore-hidden, like the stats
  manifests) — the DATA FILES ARE NEVER TOUCHED;
* ``read_dv`` serves the logical table: scan ⟕ anti-join the marks on
  the physical id.  The DV side is broadcast when small (the normal
  case — Delta keeps DVs in memory-sized roaring bitmaps for the same
  reason), falling back to a shuffled anti-join for mass deletes;
* ``purge_dv`` materializes the subtraction as an atomic stage-swap
  rewrite and clears the marks — Delta's ``REORG TABLE ... APPLY
  (PURGE)``.

Scale: a delete costs one predicate scan plus a write proportional to
the MATCH COUNT, not the table; reads pay one anti-join against the
mark set until purge.  The read-side contract is merge-on-read
everywhere: correctness never depends on purge timing.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DV_DIR = "_deletion_vectors"

#: Broadcast the mark set below this on-disk size; above it, a mass
#: delete is in progress and a shuffled anti-join is the safer plan.
BROADCAST_DV_BYTES = 32 * 1024 * 1024

_FP = "__dv_file_path"
_RI = "__dv_row_index"


def _dv_path(path: str) -> str:
    return os.path.join(path.rstrip("/"), DV_DIR)


def _dv_bytes(path: str) -> int:
    total = 0
    root = _dv_path(path)
    for r, _d, files in os.walk(root):
        total += sum(os.path.getsize(os.path.join(r, f)) for f in files)
    return total


def delete_where_dv(spark: SparkSession, path: str, condition) -> int:
    """Mark rows matching ``condition`` (Column or SQL string) as deleted.
    Appends position marks; data files are untouched.  Returns the number
    of NEWLY matching physical rows (idempotent re-marks are appended but
    harmless — the anti-join semantics dedupe, and purge clears them).

    The predicate scan sees the LOGICAL table (already-deleted rows can't
    match again), so successive deletes compose like SQL DELETEs.
    """
    cond = F.expr(condition) if isinstance(condition, str) else condition
    marks = read_dv(spark, path, _keep_ids=True).where(cond).select(_FP, _RI)
    n = marks.count()
    if n:
        marks.withColumnRenamed(_FP, "file_path").withColumnRenamed(
            _RI, "row_index"
        ).write.mode("append").parquet(_dv_path(path))
    return n


def read_dv(spark: SparkSession, path: str, _keep_ids: bool = False) -> DataFrame:
    """The logical table: physical scan minus the marked positions."""
    base = spark.read.parquet(path).select(
        "*",
        F.col("_metadata.file_path").alias(_FP),
        F.col("_metadata.row_index").alias(_RI),
    )
    dv_dir = _dv_path(path)
    if os.path.isdir(dv_dir):
        dv = spark.read.parquet(dv_dir).select(
            F.col("file_path").alias(_FP), F.col("row_index").alias(_RI)
        )
        if _dv_bytes(path) <= BROADCAST_DV_BYTES:
            dv = F.broadcast(dv)
        base = base.join(dv, [_FP, _RI], "left_anti")
    return base if _keep_ids else base.drop(_FP, _RI)


def dv_mark_count(spark: SparkSession, path: str) -> int:
    """Marked positions on disk (distinct — double marks count once)."""
    dv_dir = _dv_path(path)
    if not os.path.isdir(dv_dir):
        return 0
    return spark.read.parquet(dv_dir).select("file_path", "row_index").distinct().count()


def purge_dv(spark: SparkSession, path: str) -> int:
    """Materialize the deletes (atomic stage-swap rewrite of the surviving
    rows) and clear the marks — Delta ``REORG ... APPLY (PURGE)``.
    Returns the number of positions purged.  After purge the physical and
    logical tables coincide and row ids are REASSIGNED (new files), which
    is why marks must never be interpreted across a purge — they are
    cleared in the same swap."""
    from . import writers

    n = dv_mark_count(spark, path)
    if n == 0:
        return 0
    survivors = read_dv(spark, path)
    # Stage the rewrite FIRST (reads the old files), then swap; the DV dir
    # lives inside the table dir, so the swap drops marks and old data in
    # the same atomic rename.
    writers.overwrite_path(survivors, path)
    dv_dir = _dv_path(path)
    if os.path.isdir(dv_dir):  # pragma: no cover — swap normally removed it
        shutil.rmtree(dv_dir)
    return n
