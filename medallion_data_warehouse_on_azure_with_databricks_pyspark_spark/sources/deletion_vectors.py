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

import json
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


# ---------------------------------------------------------------------------
# Merge-on-read MERGE (round 10): upsert without rewriting a single data file
# ---------------------------------------------------------------------------

_MERGE_INTENT = "_dv_merge_intent.json"
_MERGE_STAGE = "_dv_merge_stage"


def _intent_file(path: str) -> str:
    return os.path.join(path.rstrip("/"), _MERGE_INTENT)


def _stage_dir(path: str) -> str:
    return os.path.join(path.rstrip("/"), _MERGE_STAGE)


def merge_dv(
    spark: SparkSession,
    path: str,
    source: DataFrame,
    keys: list[str],
) -> dict:
    """Merge-on-read MERGE (Delta's DV-backed MERGE shape): matched target
    rows are tombstoned via deletion-vector marks and EVERY source row is
    appended as new files — updates and inserts alike — so the merge
    writes bytes proportional to the SOURCE, never to the table.  At
    100 TB this is the difference between a daily upsert costing the
    delta (GBs) and costing a table rewrite (the copy-on-write
    ``plans/merge.py merge_versioned`` path, kept for when reader
    isolation across versions matters).

    Two physical phases — stage (marks parquet + new data files under a
    hidden stage dir), then publish (promote data files into the table,
    promote marks into ``_deletion_vectors/``) — fronted by a crash
    intent (same write-ahead pattern as ``sources/versioned.py``):
    :func:`recover_dv_merge` rolls ANY crash point forward, so a merge
    is exactly-once durable.  What this lane does NOT give is reader
    snapshot isolation during publish (a concurrent reader can glimpse
    the appended rows before the marks land — marks are promoted first
    to keep that window duplicate-free, see below); isolation belongs to
    the versioned lane's commit log.

    Publish order is MARKS FIRST: between the two promotes a reader sees
    matched keys' OLD rows hidden and NEW rows not yet visible (a
    transient under-read, repaired by roll-forward), never both versions
    at once — an under-read re-converges, a duplicate-read can poison a
    downstream aggregate.

    Source keys must be unique (asserted) — the same contract every
    MERGE engine imposes.  Returns ``{"updated": n, "inserted": n}``.
    """
    from ..plans.merge import assert_unique_source
    from .versioned import _fsync_json  # shared crash-durable JSON write

    recover_dv_merge(spark, path)
    assert_unique_source(source, keys)

    cur = read_dv(spark, path, _keep_ids=True)
    src = source.select(*spark.read.parquet(path).columns)  # align schema/order
    marks = (
        cur.join(F.broadcast(source.select(*keys).distinct()), keys, "left_semi")
        .select(F.col(_FP).alias("file_path"), F.col(_RI).alias("row_index"))
    )
    n_updated = marks.count()  # tombstoned target POSITIONS (≥ matched
    # source rows when the target carries duplicate keys — Delta's MERGE
    # updates every matching target row too)
    n_inserted = source.join(
        cur.select(*keys).distinct(), keys, "left_anti"
    ).count()

    stage = _stage_dir(path)
    if os.path.isdir(stage):  # pragma: no cover — recover() swept it
        shutil.rmtree(stage)
    marks.write.parquet(os.path.join(stage, "marks"))
    src.write.parquet(os.path.join(stage, "data"))
    _fsync_json(_intent_file(path), {"stage": _MERGE_STAGE})
    _publish_dv_merge(path)
    return {"updated": n_updated, "inserted": n_inserted}


def _publish_dv_merge(path: str) -> None:
    """Promote a staged merge: marks first (duplicate-free window), then
    data files, then drop stage + intent.  Every step is idempotent —
    re-running after a crash at any point completes the same merge."""
    stage = _stage_dir(path)
    dv_dir = _dv_path(path)
    os.makedirs(dv_dir, exist_ok=True)
    for sub, dest in (("marks", dv_dir), ("data", path.rstrip("/"))):
        sdir = os.path.join(stage, sub)
        if not os.path.isdir(sdir):  # pragma: no cover — already promoted
            continue
        for f in sorted(os.listdir(sdir)):
            if not f.endswith(".parquet"):
                continue  # _SUCCESS / .crc sidecars stay behind
            tgt = os.path.join(dest, f)
            if not os.path.exists(tgt):  # idempotent re-publish
                os.replace(os.path.join(sdir, f), tgt)
        shutil.rmtree(sdir)
    shutil.rmtree(stage, ignore_errors=True)
    intent = _intent_file(path)
    if os.path.exists(intent):
        os.remove(intent)


def recover_dv_merge(spark: SparkSession, path: str) -> bool:
    """Roll a crashed :func:`merge_dv` forward (or sweep an orphan stage
    that never reached its intent — that merge never happened and its
    rows must not leak in).  Returns True if repair work was done."""
    intent, stage = _intent_file(path), _stage_dir(path)
    if os.path.exists(intent):
        try:
            with open(intent) as fh:
                json.load(fh)
        except (ValueError, OSError):
            # unreadable intent: the stage was never fully declared —
            # treat as pre-intent crash, sweep
            shutil.rmtree(stage, ignore_errors=True)
            os.remove(intent)
            return True
        _publish_dv_merge(path)
        return True
    if os.path.isdir(stage):
        shutil.rmtree(stage)
        return True
    return False
