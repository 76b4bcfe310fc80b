"""Versioned table overwrites: Delta-style time travel on the parquet lane.

The reference's gold tables are Delta, whose transaction log gives readers
``VERSION AS OF`` / ``TIMESTAMP AS OF``, ``DESCRIBE HISTORY``, ``RESTORE``
and ``VACUUM`` (`/root/reference/Gold_Customers.py:65-68` writes the Delta
tables these operate on).  delta-spark is env-blocked here (COVERAGE.md r3
adjudication), so this module supplies the same lifecycle on the atomic
dir-swap protocol ``sources/writers.py`` already uses:

* the CURRENT version's data lives at ``<path>`` as plain parquet — every
  existing reader (``spark.read.parquet``, external tables, the catalog)
  keeps working unchanged;
* superseded versions are *renamed aside* (O(1), no copy) into
  ``<path>.__versions/v<k>/``, with an append-only JSON log recording each
  commit's version number and timestamp;
* ``read_version`` / ``read_as_of`` resolve a reader against the log;
  ``restore`` re-commits an old version as a NEW version (Delta RESTORE
  semantics — history is never rewritten); ``vacuum`` drops retained
  version directories beyond a retention count but keeps their log entries
  (history survives vacuum, data does not — same as Delta).

Concurrency contract: one writer per table (the same contract the
stage-swap writer already has); readers are never blocked and never see a
half-written state because every mutation is a directory rename.

At 100 TB the rename-aside retention is the cheap part — the cost model is
identical to Delta's (old files linger until VACUUM); what this lane does
NOT give is file-level MERGE history inside a version, which needs the
real transaction log and is exactly what the delta-available() fast path
provides on capable deployments.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession

LOG_FILE = "log.json"


def _vroot(path: str) -> str:
    return path.rstrip("/") + ".__versions"


def _read_log(path: str) -> list[dict]:
    log_path = os.path.join(_vroot(path), LOG_FILE)
    if not os.path.exists(log_path):
        return []
    with open(log_path) as fh:
        return json.load(fh)


def _write_log(path: str, log: list[dict]) -> None:
    vroot = _vroot(path)
    os.makedirs(vroot, exist_ok=True)
    tmp = os.path.join(vroot, f".{LOG_FILE}.{uuid.uuid4().hex[:8]}")
    with open(tmp, "w") as fh:
        json.dump(log, fh, indent=1)
    os.replace(tmp, os.path.join(vroot, LOG_FILE))


def current_version(path: str) -> int | None:
    """Version number of the data at ``path`` (None: never written)."""
    log = _read_log(path)
    return log[-1]["version"] if log else None


def overwrite_versioned(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    now: float | None = None,
) -> int:
    """Atomic overwrite that RETAINS the superseded version (rename-aside,
    no copy).  Returns the committed version number.  ``now`` pins the
    commit timestamp for reproducible tests (same contract as the SCD
    plans' ``now=``)."""
    stage = f"{path}.__stage_{uuid.uuid4().hex[:8]}"
    writer = df.write.mode("overwrite").format("parquet")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(stage)

    log = _read_log(path)
    version = (log[-1]["version"] + 1) if log else 0
    vroot = _vroot(path)
    os.makedirs(vroot, exist_ok=True)
    if os.path.exists(path):
        os.rename(path, os.path.join(vroot, f"v{version - 1}"))
    os.rename(stage, path)
    log.append(
        {
            "version": version,
            "committed_at": float(now if now is not None else time.time()),
            "operation": "WRITE",
        }
    )
    _write_log(path, log)
    return version


def _resolve_dir(path: str, version: int) -> str:
    log = _read_log(path)
    if not log:
        raise ValueError(f"{path}: no version log — not a versioned table")
    known = {e["version"] for e in log}
    if version not in known:
        raise ValueError(f"{path}: unknown version {version} (log has {sorted(known)})")
    if version == log[-1]["version"]:
        return path
    vdir = os.path.join(_vroot(path), f"v{version}")
    if not os.path.exists(vdir):
        raise ValueError(
            f"{path}: version {version} was vacuumed — its history entry "
            "remains but the data is gone"
        )
    return vdir


def read_version(spark: SparkSession, path: str, version: int) -> DataFrame:
    """``VERSION AS OF``: the table exactly as committed at ``version``."""
    return spark.read.parquet(_resolve_dir(path, version))


def read_as_of(spark: SparkSession, path: str, ts: float) -> DataFrame:
    """``TIMESTAMP AS OF``: the newest version committed at or before
    ``ts`` (epoch seconds)."""
    log = _read_log(path)
    eligible = [e for e in log if e["committed_at"] <= ts]
    if not eligible:
        raise ValueError(f"{path}: no version committed at or before {ts}")
    return read_version(spark, path, eligible[-1]["version"])


def history(path: str) -> list[dict]:
    """``DESCRIBE HISTORY``: newest first, every commit ever made —
    including vacuumed versions (data gone, history kept) and restores."""
    return list(reversed(_read_log(path)))


def restore(
    spark: SparkSession,
    path: str,
    version: int,
    now: float | None = None,
) -> int:
    """Delta ``RESTORE TABLE ... TO VERSION AS OF``: re-commits the old
    version's data as a NEW version (history is append-only; the restore
    itself is visible in ``history``)."""
    df = read_version(spark, path, version)
    new_version = overwrite_versioned(df, path, now=now)
    log = _read_log(path)
    log[-1]["operation"] = f"RESTORE(v{version})"
    _write_log(path, log)
    return new_version


def vacuum(path: str, keep_last: int = 2) -> list[int]:
    """Drop retained version DIRECTORIES beyond the newest ``keep_last``
    non-current ones; log entries survive (Delta: history outlives data).
    Returns the vacuumed version numbers."""
    if keep_last < 0:
        raise ValueError("keep_last must be >= 0")
    log = _read_log(path)
    if not log:
        return []
    current = log[-1]["version"]
    vroot = _vroot(path)
    retained = sorted(
        int(d[1:]) for d in os.listdir(vroot)
        if d.startswith("v") and d[1:].isdigit() and int(d[1:]) != current
    )
    to_drop = retained[: max(0, len(retained) - keep_last)]
    for v in to_drop:
        shutil.rmtree(os.path.join(vroot, f"v{v}"))
    return to_drop


def table_changes(
    spark: SparkSession,
    path: str,
    key_cols: list[str],
    from_version: int,
    to_version: int,
) -> DataFrame:
    """Change Data Feed between two retained versions (Delta
    ``table_changes`` shape): every row keyed by ``key_cols`` classified as
    ``insert`` / ``delete`` / ``update_preimage`` / ``update_postimage``
    in a ``_change_type`` column, with ``_commit_version`` = ``to_version``.

    Snapshot-diff semantics: changes are NET across the version range
    (a row inserted then deleted between the endpoints does not appear) —
    the coalesced view downstream consumers actually want; per-commit
    granularity needs the real transaction log (delta-available() path).

    Plan: ONE full-outer join of the two snapshots on the keys; update
    detection is a single null-safe struct equality over the non-key
    columns — no per-column expression blowup, full codegen.
    """
    from functools import reduce

    from pyspark.sql import functions as F

    old = read_version(spark, path, from_version).alias("o")
    new = read_version(spark, path, to_version).alias("n")
    cols = read_version(spark, path, to_version).columns
    if set(cols) != set(read_version(spark, path, from_version).columns):
        raise ValueError(
            "table_changes across a schema change is not supported on the "
            "snapshot-diff path"
        )
    non_keys = [c for c in cols if c not in key_cols]
    on = reduce(
        lambda a, b: a & b,
        [F.col(f"o.{k}").eqNullSafe(F.col(f"n.{k}")) for k in key_cols],
    )
    j = old.join(new, on, "full_outer")
    o_key = F.col(f"o.{key_cols[0]}")
    n_key = F.col(f"n.{key_cols[0]}")
    same = (
        F.struct(*[F.col(f"o.{c}") for c in non_keys]).eqNullSafe(
            F.struct(*[F.col(f"n.{c}") for c in non_keys])
        )
        if non_keys
        else F.lit(True)
    )

    def side(prefix: str) -> list:
        return [F.col(f"{prefix}.{c}").alias(c) for c in cols]

    ver = F.lit(to_version).cast("long").alias("_commit_version")
    inserts = j.filter(o_key.isNull() & n_key.isNotNull()).select(
        *side("n"), F.lit("insert").alias("_change_type"), ver
    )
    deletes = j.filter(o_key.isNotNull() & n_key.isNull()).select(
        *side("o"), F.lit("delete").alias("_change_type"), ver
    )
    changed = j.filter(o_key.isNotNull() & n_key.isNotNull() & ~same)
    pre = changed.select(
        *side("o"), F.lit("update_preimage").alias("_change_type"), ver
    )
    post = changed.select(
        *side("n"), F.lit("update_postimage").alias("_change_type"), ver
    )
    return inserts.unionByName(deletes).unionByName(pre).unionByName(post)


def cdf_to_cdc_events(changes: DataFrame) -> DataFrame:
    """Adapt a :func:`table_changes` feed into the CDC-event shape
    ``plans.pipeline.Pipeline.apply_changes`` consumes: keep inserts and
    update POST-images as upserts, keep deletes, drop pre-images (they
    carry no target state), and expose ``_change_type``/``_commit_version``
    as ``operation``/``sequence_num`` — so a versioned table's change feed
    can drive a downstream SCD dimension with
    ``apply_as_deletes="operation = 'DELETE'"`` and
    ``sequence_by="sequence_num"``, the same wiring a Delta CDF → DLT
    pipeline uses."""
    from pyspark.sql import functions as F

    return (
        changes.filter(F.col("_change_type") != "update_preimage")
        .withColumn(
            "operation",
            F.when(F.col("_change_type") == "delete", F.lit("DELETE"))
            .otherwise(F.lit("UPSERT")),
        )
        .withColumnRenamed("_commit_version", "sequence_num")
        .drop("_change_type")
    )


def recover(path: str) -> bool:
    """Crash recovery for the two-rename commit window: if a writer died
    after renaming the live table aside but before promoting its staged
    replacement, the table path is missing while the log's newest version
    sits in the retention area — rename it back.  Orphaned ``.__stage_*``
    directories (writer died mid-write, table untouched) are swept either
    way.  Returns True if the live path was restored.  Idempotent; safe to
    run at every startup, like Delta's log replay."""
    parent = os.path.dirname(path.rstrip("/")) or "."
    base = os.path.basename(path.rstrip("/"))
    if os.path.isdir(parent):
        for d in os.listdir(parent):
            if d.startswith(f"{base}.__stage_"):
                shutil.rmtree(os.path.join(parent, d))
    log = _read_log(path)
    if not log or os.path.exists(path):
        return False
    current = log[-1]["version"]
    vdir = os.path.join(_vroot(path), f"v{current}")
    if os.path.exists(vdir):
        # interrupted AFTER the aside-rename of the then-live version but
        # BEFORE log append of the new one: the aside dir carries the
        # logged current version — restore it
        os.rename(vdir, path)
        return True
    return False
