"""Idempotent-writer streaming fold — the ``txnAppId``/``txnVersion``
ledger (Delta's ``txn`` action) on this engine's versioned tables.

``foreachBatch`` is at-least-once: after a crash between a sink commit
and the streaming checkpoint advance, the SAME batch id replays.  Two
ways to survive that:

* **idempotent-by-construction** — replaying is a value no-op
  (``streaming/matview_stream.py``: MERGE of already-held rows yields an
  empty change feed; ``streaming/index_stream.py``: replay-deduped
  appends).  No bookkeeping, but only available when the fold's algebra
  cooperates;
* **ledger-guarded** (this module) — the fold is genuinely
  NON-idempotent (counters: re-adding a batch double-counts), so each
  commit records ``{"txn": {"app_id", "version": batch_id}}`` in the
  versioned commit metadata and the writer SKIPS any batch id ≤
  ``sources/versioned.py::last_txn_version``.  This is exactly the
  ``df.write.option("txnAppId", ...).option("txnVersion", ...)`` idiom
  Delta documents for foreachBatch sinks.

The ledger is per ``app_id``: two different streams folding into the
same table keep independent ledgers (their commits interleave through
the optimistic-concurrency gate), while a restart of the SAME stream —
the replay case — is filtered by its own high-water mark.

Scale: the per-batch state table carries one row per group (bounded by
the group-key cardinality, not the stream), the fold is one broadcast-
sized full-outer merge per batch, and the ledger read is a metadata-only
scan of the commit log — no data files are opened to decide a skip.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import versioned


def apply_counter_batch(
    spark: SparkSession,
    table_path: str,
    batch: DataFrame,
    batch_id: int,
    app_id: str,
    group_col: str = "event_type",
    value_col: str = "value",
    now: float | None = None,
) -> bool:
    """Fold one micro-batch of additive counters into the versioned state
    table, guarded by the writer ledger.  Returns False (and changes
    NOTHING) when ``batch_id`` is at or below the app's recorded
    high-water mark — the replayed-batch case; True when the fold
    committed.

    The commit pins ``expected_version`` to the snapshot the fold read,
    so a rival writer interleaving between read and commit surfaces as
    ``ConcurrentWriteError`` instead of silently losing either commit
    (single-writer-per-app_id is the streaming contract; the gate
    protects against OTHER writers, e.g. a manual backfill).
    """
    base_v = versioned.current_version(table_path)
    if base_v is not None:
        last = versioned.last_txn_version(table_path, app_id)
        if last is not None and batch_id <= last:
            return False
    delta = batch.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col(value_col).cast("decimal(18,4)")).alias("total_value"),
    )
    if base_v is None:
        state = delta
    else:
        old = versioned.read_current(spark, table_path)
        d = delta.select(
            F.col(group_col).alias("__g"),
            F.col("n_events").alias("__n"),
            F.col("total_value").alias("__t"),
        )
        # eqNullSafe: a NULL group key must fold into the SAME standing
        # row, not spawn an unmatched pair per batch (ADVICE r10 — plain
        # equality never matches NULLs, so NULL-group rows would
        # accumulate and diverge from the SQL oracle's single NULL group)
        state = (
            old.join(d, old[group_col].eqNullSafe(d["__g"]), "full_outer")
            .select(
                F.coalesce(old[group_col], F.col("__g")).alias(group_col),
                (
                    F.coalesce(old["n_events"], F.lit(0))
                    + F.coalesce(F.col("__n"), F.lit(0))
                ).alias("n_events"),
                (
                    F.coalesce(old["total_value"], F.lit(0).cast("decimal(18,4)"))
                    + F.coalesce(F.col("__t"), F.lit(0).cast("decimal(18,4)"))
                ).alias("total_value"),
            )
        )
    versioned.overwrite_versioned(
        state,
        table_path,
        now=now,
        operation="STREAM_FOLD",
        expected_version=base_v,
        metadata={"txn": {"app_id": app_id, "version": int(batch_id)}},
    )
    return True


def counter_fold_ingest(
    spark: SparkSession,
    source_dir: str,
    table_path: str,
    checkpoint_dir: str,
    app_id: str,
    schema,
    group_col: str = "event_type",
    value_col: str = "value",
    max_files_per_trigger: int = 1,
    now: float | None = None,
) -> None:
    """Checkpointed availableNow ingest: every micro-batch folds its
    per-group counts/sums into ``table_path`` as one ledger-stamped
    versioned commit.  ``max_files_per_trigger=1`` gives deterministic
    batch boundaries (one landing file = one batch); additive counters
    are batch-order-free, so discovery order cannot change the result.
    ``now`` pins commit timestamps as ``now + batch_id`` (reproducible
    history, distinct per commit)."""

    def process_batch(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        apply_counter_batch(
            spark, table_path, batch, batch_id, app_id,
            group_col, value_col,
            now=None if now is None else now + float(batch_id),
        )

    (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
        .writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
