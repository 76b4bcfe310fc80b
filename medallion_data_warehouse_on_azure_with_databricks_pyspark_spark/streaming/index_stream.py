"""Streaming maintenance of the IVFADC ANN index: continuous-crawl
embeddings keep the artifact fresh.

The 100 TB operating mode for the vector index is not build-once: a
crawler emits new embeddings continuously, takedowns remove them, and
every retrieval query must see the CURRENT corpus.  This module wires
Structured Streaming's ``foreachBatch`` to the IVFADC artifact's
incremental surface (``operators/similarity.append_to_ivfpq_index`` +
``operators/index_maintenance.delete_from_index``) the same way
``dedup_stream.py`` feeds the MinHash index:

* each micro-batch's UPSERT rows assign against the STORED pivots and
  encode under the STORED codebooks (frozen quantizer — drift means an
  explicit rebuild), appending only the batch's rows: cost is
  O(|batch|), independent of standing index size;
* DELETE rows tombstone their ids — O(|deleted|), no index rows
  touched; every read path anti-joins candidates against the tombstone
  set, so a deleted vector stops matching immediately and the next
  ``compact_index`` makes the removal physical.

Ordering inside a batch: appends land first, deletes second — a batch
that both upserts and deletes the same id nets to deleted (the
tombstone wins), matching CDC latest-wins intuition.  Tombstones
suppress an id until compaction folds them, so RE-inserting a
previously deleted id requires a ``compact_index`` first — the standard
log-structured tombstone trade-off, stated rather than hidden.

Restart semantics: the index append is at-least-once (it runs before
the checkpoint commits the batch) — a crash-and-replay may duplicate a
batch's code/vector rows.  Every read path already neutralizes
duplicates (``dropDuplicates`` on the candidate and re-rank sides, a
``distinct`` tombstone set), and compaction reclaims the storage; the
replayed tombstone append is idempotent by the same argument.  This is
the exact contract the MinHash streaming appender documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _append_fn(family: str):
    """The family's incremental-append surface — every vector-index
    builder ships one with the same ``(new_vectors, index_path)``
    signature and the same frozen-quantizer contract."""
    from ..operators import similarity

    try:
        return {
            "ivf": similarity.append_to_ivf_index,
            "pq": similarity.append_to_pq_index,
            "sq8": similarity.append_to_sq8_index,
            "ivfpq": similarity.append_to_ivfpq_index,
            "ivfsq8": similarity.append_to_ivfsq8_index,
            "ivfbq": similarity.append_to_ivfbq_index,
            "matryoshka": similarity.append_to_matryoshka_index,
        }[family]
    except KeyError:
        raise ValueError(
            f"no streaming append surface for index family {family!r}"
        ) from None


def index_ingest(
    spark: SparkSession,
    source_dir: str,
    index_path: str,
    checkpoint_dir: str,
    schema: str = "vec_id long, embedding array<float>, op string",
    op_col: str = "op",
    delete_op: str = "DELETE",
    max_files_per_trigger: int = 1,
) -> None:
    """Run-once streaming maintenance of ANY vector-index artifact from a
    parquet directory of vector CDC events — the family (IVF / PQ / SQ8 /
    IVFADC / IVF-SQ8) is read from the artifact's own manifest and
    dispatched to its ``append_to_*`` surface, so one streaming wire
    serves the whole ladder.

    Rows whose ``op_col`` equals ``delete_op`` tombstone their id; every
    other row is an upsert appended to the index (assigned/encoded under
    the stored frozen quantizer).  If ``schema`` carries no ``op_col``
    at all, the whole stream is upserts.  The id/vector column names
    come from the index's own manifest — the artifact, not the caller,
    is the source of truth (same contract as the readers).

    ``max_files_per_trigger=1`` keeps batch boundaries deterministic for
    tests and replay; production streams would raise it and let the
    checkpoint define batches.
    """
    from ..operators import index_maintenance

    meta = index_maintenance._read_meta(index_path)
    id_col, vec_col = meta["id_col"], meta["vec_col"]
    append = _append_fn(index_maintenance._family(meta))

    def process_batch(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        has_op = op_col in batch.columns
        batch = batch.persist()
        upserts = (
            batch.filter(
                (F.col(op_col) != delete_op) | F.col(op_col).isNull()
            )
            if has_op
            else batch
        ).select(id_col, vec_col)
        if not upserts.isEmpty():
            append(upserts, index_path)
        if has_op:
            deletes = batch.filter(F.col(op_col) == delete_op).select(id_col)
            if not deletes.isEmpty():
                index_maintenance.delete_from_index(deletes, index_path)
        batch.unpersist()

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


def ivfpq_index_ingest(
    spark: SparkSession,
    source_dir: str,
    index_path: str,
    checkpoint_dir: str,
    schema: str = "vec_id long, embedding array<float>, op string",
    op_col: str = "op",
    delete_op: str = "DELETE",
    max_files_per_trigger: int = 1,
) -> None:
    """Back-compat name for :func:`index_ingest` pointed at an IVFADC
    artifact (the family dispatch reads the manifest either way)."""
    index_ingest(
        spark, source_dir, index_path, checkpoint_dir,
        schema=schema, op_col=op_col, delete_op=delete_op,
        max_files_per_trigger=max_files_per_trigger,
    )
