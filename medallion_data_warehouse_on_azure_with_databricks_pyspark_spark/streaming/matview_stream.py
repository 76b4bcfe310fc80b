"""Streaming maintenance of an incrementally-refreshed materialized view.

The continuous shape of the lakehouse aggregate story: CDC events stream
in, each micro-batch lands in the versioned base table as ONE
transactional MERGE commit, and the materialized view folds exactly that
commit's change feed into its standing aggregates — so the view tracks
the stream at a per-batch cost of O(|batch| + |affected groups|),
never a base rescan.  This chains three surfaces this engine already
guarantees individually:

* ``plans/merge.py::merge_versioned`` — the batch upsert/delete is an
  optimistic transaction (claim + expected_version), so a concurrent
  OPTIMIZE or manual DML on the base cannot interleave with the stream's
  commit; the merge retries against the fresh snapshot instead;
* ``sources/versioned.py::table_changes`` — the commit's net row-level
  delta, which
* ``plans/matview.py::refresh`` folds into the view as its own atomic
  versioned commit carrying the reflected base version in the commit
  metadata.

Restart semantics are EXACTLY-ONCE in effect despite foreachBatch's
at-least-once contract, with no dedup bookkeeping: a replayed batch
re-merges rows the base already holds, the null-safe CDF classifier sees
value-identical rows as unchanged, the delta is empty, and
``refresh`` no-ops (its reflected-base-version check makes even a
replayed non-empty fold idempotent).  This is the same
"idempotent-by-construction, not by ledger" argument the IVFADC and
MinHash streaming appenders document — here it falls out of the CDF
being a NET diff rather than an event log.

Within a batch, keys must be unique (SQL MERGE cardinality); CDC feeds
with multiple events per key per batch pass ``sequence_col`` and the
batch is first collapsed latest-wins — the same W5 discipline as
``plans/scd.py::apply_changes``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.windows import latest_per_key
from ..plans import matview
from ..plans.merge import merge_versioned, s


def matview_maintained_ingest(
    spark: SparkSession,
    source_dir: str,
    base_path: str,
    view_path: str,
    checkpoint_dir: str,
    keys: list[str],
    schema: str,
    op_col: str | None = None,
    delete_op: str = "DELETE",
    sequence_col: str | None = None,
    max_files_per_trigger: int = 1,
    now: float | None = None,
) -> list[dict]:
    """Run-once streaming maintenance of ``view_path`` from a parquet
    directory of CDC events against its versioned base at ``base_path``.

    Per micro-batch: (1) collapse to the latest event per key when
    ``sequence_col`` is given; (2) MERGE into the base — rows whose
    ``op_col`` equals ``delete_op`` delete their key, everything else
    upserts every non-op column; (3) incrementally refresh the view from
    the commit's CDF.  ``now`` pins commit timestamps for reproducible
    tests (batch i commits at ``now + i``).  Returns the refresh
    summaries (one per non-empty batch), newest last.

    ``max_files_per_trigger=1`` keeps batch boundaries deterministic for
    tests; production streams raise it and let the checkpoint define
    batches.
    """
    summaries: list[dict] = []

    def fold(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        bspark = batch.sparkSession
        if sequence_col is not None:
            batch = latest_per_key(batch, keys, sequence_col).drop(
                sequence_col
            )
        data_cols = [
            c for c in batch.columns if c != op_col
        ]
        merge_kwargs: dict = {
            "update_set": {c: s(c) for c in data_cols if c not in keys},
            "insert_values": {c: s(c) for c in data_cols},
        }
        if op_col is not None and op_col in batch.columns:
            merge_kwargs["delete_condition"] = s(op_col) == F.lit(delete_op)
            # a delete event's key must still not INSERT when unmatched
            merge_kwargs["insert_condition"] = s(op_col) != F.lit(delete_op)
        commit_now = None if now is None else now + float(batch_id)
        merge_versioned(
            bspark, base_path, batch, keys, now=commit_now, **merge_kwargs
        )
        summaries.append(
            matview.refresh(bspark, view_path, now=commit_now)
        )

    (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
        .writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    return summaries
