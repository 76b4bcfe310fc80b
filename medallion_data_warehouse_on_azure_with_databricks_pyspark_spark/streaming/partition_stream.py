"""Partition-overwrite streaming sink — Spark's ``insert_overwrite``
foreachBatch idiom on this engine's versioned tables.

The third answer to foreachBatch's at-least-once replay (see
``streaming/upsert_stream.py`` for the taxonomy): when every micro-batch
carries COMPLETE partitions (the backfill/late-landing shape — a file
per day, re-delivered days re-land whole), replacing those partitions is
**idempotent by construction** — replaying a batch replaces the same
partitions with the same content, so no ledger and no dedup state are
needed, and a REVISED re-delivery of a partition is not a failure mode
but the designed update path.

Each batch commits through
``sources/versioned.py::replace_partitions`` (touched partitions
written, untouched hardlinked — zero copy), so the table keeps full
history/time travel per micro-batch and the sink composes with the
commute rule: a concurrent backfill job replacing OTHER partitions does
not conflict with the stream.

Scale: per-batch cost is touched-partition bytes + link metadata,
independent of table size; the stream never rewrites or rescans the
standing table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources import versioned


def apply_partition_batch(
    table_path: str,
    batch: DataFrame,
    partition_col: str,
    now: float | None = None,
    snapshot_mode: str | None = None,
) -> bool:
    """Land one partition-complete micro-batch: first batch creates the
    partitioned table (``snapshot_mode`` fixes its layout — pass
    ``"manifest"`` for O(changed files) per-batch commits at high
    partition counts), later batches replace exactly the partitions the
    batch carries.  Empty batches are no-ops (False).  Idempotent by
    construction — replay re-replaces identical content."""
    if batch.isEmpty():
        return False
    if versioned.current_version(table_path) is None:
        versioned.overwrite_versioned(
            batch, table_path, partition_by=[partition_col], now=now,
            operation="STREAM_PARTITION_INIT", snapshot_mode=snapshot_mode,
        )
        return True
    versioned.replace_partitions(
        batch, table_path, partition_col,
        expected_version=versioned.current_version(table_path),
        now=now, operation="STREAM_PARTITION_OVERWRITE",
    )
    return True


def partition_overwrite_ingest(
    spark: SparkSession,
    landing_dir: str,
    table_path: str,
    checkpoint_dir: str,
    partition_col: str,
    schema,
    now: float | None = None,
    snapshot_mode: str | None = None,
) -> None:
    """Checkpointed availableNow run: one landing file per micro-batch
    (``maxFilesPerTrigger=1`` — the file IS the partition-complete
    delivery unit), each batch partition-overwritten into the versioned
    table.  Restarts resume from the checkpoint; replays are value
    no-ops.  ``snapshot_mode`` fixes the table layout on first batch."""

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        apply_partition_batch(
            table_path, batch_df, partition_col,
            now=(now + batch_id) if now is not None else None,
            snapshot_mode=snapshot_mode,
        )

    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(landing_dir)
        .writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
