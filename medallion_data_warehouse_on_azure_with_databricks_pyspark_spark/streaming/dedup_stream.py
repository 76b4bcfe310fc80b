"""Streaming dedup-on-arrival: the continuous-crawl ingestion pattern.

Each arriving micro-batch of documents is near-dup-checked against the
standing corpus's materialized MinHash index
(``operators/dedup.build_minhash_index``), survivors are appended to both
the accepted-documents table and the index itself, and flagged duplicates
are quarantined with their matching corpus doc — so the corpus only ever
grows by novel content, and the check for batch N+1 automatically sees
what batch N admitted.

Why ``foreachBatch``: the per-batch logic (index join + exact-Jaccard
verify + index append) is a batch computation over an incremental input —
exactly the case Structured Streaming's ``foreachBatch`` exists for.  The
stream carries only the new documents; the standing corpus is touched
exclusively through its index artifact (band rows + shingle sets), never
re-scanned as text.

Scale notes (100 TB standing corpus, GB-scale batches): per batch the
work is the batch's own shingle pass plus a band equi-join against the
index — independent of corpus *text* size; the index append writes only
the batch's rows.

Restart semantics: the accepted/rejected sinks write each batch into its
own ``batch_id=N`` directory with OVERWRITE, so a crash-and-replay of a
batch rewrites the same directory instead of duplicating rows
(exactly-once for the document tables).  The index append is at-least-
once: a replayed batch may re-append its band/shingle rows.  Because the
append happens before the checkpoint commit, the replay would otherwise
see its own rows in the index and self-quarantine — the per-batch guard
in ``process_batch`` drops index matches whose ``right_id`` is in the
current batch, so a replay reproduces the original accept/reject split
exactly; the duplicated index rows cost storage only (candidates are
``distinct``), reclaimed by the next compaction/rebuild.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def dedup_ingest(
    spark: SparkSession,
    source_dir: str,
    index_path: str,
    accepted_dir: str,
    rejected_dir: str,
    checkpoint_dir: str,
    schema: str = "doc_id long, text string",
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    max_files_per_trigger: int = 1,
) -> None:
    """Run-once streaming ingestion of ``source_dir`` parquet files with
    dedup-on-arrival against (and append-into) ``index_path``.

    Per micro-batch:

    1. intra-batch near-dups collapse to their min-id representative
       (``minhash_dedup_pairs`` + ``dedup_keep_representatives``);
    2. representatives matching the standing index at ``threshold``
       land in ``rejected_dir`` with ``(id, matched_id, jaccard)``;
    3. novel documents land in ``accepted_dir`` AND are appended to the
       index (``append_to_minhash_index``), so later batches dedup
       against them too.

    ``id_col``/``text_col`` name the stream's document columns (``schema``
    must carry both).  ``max_files_per_trigger=1`` makes each source file
    its own batch — deterministic batch boundaries for tests and replay.
    Per-batch document writes go to ``batch_id=N`` subdirectories with
    overwrite (idempotent under replay — see module docstring); the
    shard-side operator persist is disabled so a long-running stream
    cannot accumulate SQL-cache entries batch over batch.
    """
    import os

    from ..operators import dedup

    def process_batch(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        batch = batch.persist()
        reps = dedup.dedup_keep_representatives(
            batch,
            dedup.minhash_dedup_pairs(
                batch, id_col=id_col, text_col=text_col, threshold=threshold
            ),
            id_col=id_col,
        ).persist()
        pairs = dedup.minhash_pairs_against_index(
            reps, index_path, id_col=id_col, text_col=text_col,
            threshold=threshold, persist_shard=False,
        )
        # Crash-replay guard: the index append below runs BEFORE the
        # streaming checkpoint commits this batch, so a replayed batch
        # finds its own representatives already in the index (jaccard
        # 1.0 self-matches) and would quarantine every previously
        # admitted doc — overwriting accepted/batch_id=N with nothing.
        # Dropping pairs whose right_id belongs to the current batch
        # restores idempotency; it cannot mask a genuine duplicate
        # because intra-batch duplicates were already collapsed to
        # representatives above.
        pairs = pairs.join(
            reps.select(F.col(id_col).alias("right_id")),
            "right_id",
            "left_anti",
        )
        best = (
            pairs.groupBy("left_id")
            .agg(F.max(F.struct("jaccard", "right_id")).alias("__b"))
            .select(
                F.col("left_id").alias(id_col),
                F.col("__b.right_id").alias("matched_id"),
                F.col("__b.jaccard").alias("jaccard"),
            )
        ).persist()
        best.write.mode("overwrite").parquet(
            os.path.join(rejected_dir, f"batch_id={batch_id}")
        )
        accepted = reps.join(
            best.select(id_col), id_col, "left_anti"
        ).persist()
        accepted.write.mode("overwrite").parquet(
            os.path.join(accepted_dir, f"batch_id={batch_id}")
        )
        dedup.append_to_minhash_index(
            accepted, index_path, id_col=id_col, text_col=text_col
        )
        for df in (best, accepted, reps, batch):
            df.unpersist()

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
