"""Streaming dedup-on-arrival: per-batch index check, quarantine, and
index growth across batches (continuous-crawl semantics)."""

from __future__ import annotations

import pytest

import os
import time

from medallion_data_warehouse_on_azure_with_databricks_pyspark_spark.operators import (
    dedup,
)
from medallion_data_warehouse_on_azure_with_databricks_pyspark_spark.streaming import (
    dedup_stream,
)

BASE = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliett kilo "
    "lima mike november oscar papa quebec romeo sierra tango uniform victor "
    "whiskey xray yankee zulu one two three four five six seven eight nine"
)



#: opt-in tier (pytest.ini): checkpointed streaming-dedup e2e harness
pytestmark = pytest.mark.slow

def _variant(tail: str) -> str:
    # 35 shared leading tokens + a distinct tail ⇒ pairwise Jaccard ≈ 0.9
    # against BASE-family texts (well above the 0.8 threshold).
    return BASE + " " + tail


def test_streaming_dedup_ingest_e2e(spark, tmp_path):
    corpus = spark.createDataFrame(
        [
            (1, _variant("ending red")),
            (2, "completely different standing corpus document about spark "
                "engines shuffles partitions joins aggregates windows"),
        ],
        "doc_id long, text string",
    )
    idx = dedup.build_minhash_index(corpus, str(tmp_path / "idx"))
    n_band_rows_before = spark.read.parquet(f"{idx}/bands").count()

    src = tmp_path / "src"
    # batch 1: 101 novel; 102 near-dups corpus doc 1; 103/104 are
    # intra-batch near-dups of each other (both novel vs the corpus).
    spark.createDataFrame(
        [
            (101, "a wholly novel crawl document with its own content "
                  "mentioning catalysts tungsten codegen and arrow batches"),
            (102, _variant("ending blue")),
            (103, "another novel family text shared by one hundred three "
                  "and one hundred four docs diverging only at the tail x"),
            (104, "another novel family text shared by one hundred three "
                  "and one hundred four docs diverging only at the tail y"),
        ],
        "doc_id long, text string",
    ).coalesce(1).write.parquet(str(src / "f1.parquet"))
    time.sleep(1.1)  # distinct mtimes ⇒ deterministic batch order
    # batch 2: 201 near-dups doc 101 (accepted in batch 1 — only caught if
    # the index grew); 202 novel.
    spark.createDataFrame(
        [
            (201, "a wholly novel crawl document with its own content "
                  "mentioning catalysts tungsten codegen and arrow patches"),
            (202, "fresh second batch document about entirely new topics "
                  "like winnowing fingerprints and gopher quality rules"),
        ],
        "doc_id long, text string",
    ).coalesce(1).write.parquet(str(src / "f2.parquet"))
    dedup_stream.dedup_ingest(
        spark,
        source_dir=f"{src}/*",
        index_path=idx,
        accepted_dir=str(tmp_path / "accepted"),
        rejected_dir=str(tmp_path / "rejected"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        threshold=0.8,
    )

    accepted = {
        r["doc_id"]
        for r in spark.read.parquet(str(tmp_path / "accepted")).collect()
    }
    rejected = {
        r["doc_id"]: (r["matched_id"], r["jaccard"])
        for r in spark.read.parquet(str(tmp_path / "rejected")).collect()
    }
    # 103/104: intra-batch near-dups collapse to min-id representative 103.
    assert accepted == {101, 103, 202}, accepted
    assert set(rejected) == {102, 201}, rejected
    assert rejected[102][0] == 1       # matched the standing corpus doc
    assert rejected[201][0] == 101     # matched a doc ACCEPTED in batch 1
    assert all(j >= 0.8 for _m, j in rejected.values())

    # the index grew by exactly the accepted docs' band rows (32 each)
    bands = spark.read.parquet(f"{idx}/bands")
    assert bands.count() == n_band_rows_before + 32 * len(accepted)
    assert {r["doc_id"] for r in bands.select("doc_id").distinct().collect()} == {
        1, 2, 101, 103, 202,
    }


def test_crash_replay_batch_is_idempotent(spark, tmp_path):
    """A batch replayed AFTER its index append committed (crash before the
    streaming checkpoint commit) must reproduce the original accept/reject
    split — its reps are already in the index, and without the self-batch
    guard every one of them would self-match at jaccard 1.0 and overwrite
    ``accepted/batch_id=0`` with nothing."""
    corpus = spark.createDataFrame(
        [(1, _variant("ending red"))], "doc_id long, text string"
    )
    idx = dedup.build_minhash_index(corpus, str(tmp_path / "idx"))

    src = tmp_path / "src"
    spark.createDataFrame(
        [
            (101, "a wholly novel crawl document with its own content "
                  "mentioning catalysts tungsten codegen and arrow batches"),
            (102, _variant("ending blue")),
        ],
        "doc_id long, text string",
    ).coalesce(1).write.parquet(str(src / "f1.parquet"))

    kwargs = dict(
        spark=spark,
        source_dir=f"{src}/*",
        index_path=idx,
        accepted_dir=str(tmp_path / "accepted"),
        rejected_dir=str(tmp_path / "rejected"),
        threshold=0.8,
    )
    dedup_stream.dedup_ingest(checkpoint_dir=str(tmp_path / "ckpt1"), **kwargs)
    first_accepted = {
        r["doc_id"]
        for r in spark.read.parquet(str(tmp_path / "accepted")).collect()
    }
    assert first_accepted == {101}

    # Fresh checkpoint ⇒ Structured Streaming replays the same file as
    # batch 0, now against an index that already holds doc 101's rows.
    dedup_stream.dedup_ingest(checkpoint_dir=str(tmp_path / "ckpt2"), **kwargs)
    accepted = {
        r["doc_id"]
        for r in spark.read.parquet(str(tmp_path / "accepted")).collect()
    }
    rejected = {
        r["doc_id"]: r["matched_id"]
        for r in spark.read.parquet(str(tmp_path / "rejected")).collect()
    }
    assert accepted == {101}, accepted      # not silently dropped
    assert rejected == {102: 1}, rejected   # still matches the CORPUS doc,
    #                                         never itself / a batch peer
    # replayed append is at-least-once: doc 101's band rows appear twice
    bands = spark.read.parquet(f"{idx}/bands")
    assert bands.filter("doc_id = 101").count() == 64
