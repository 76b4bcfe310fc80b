"""Distributed BPE tokenizer training over a document corpus.

Training a tokenizer is a standard early stage of an LLM data pipeline,
and its cost structure splits cleanly in two — which is exactly how the
public implementations structure it (Sennrich et al. ACL 2016 learn
merges from a word-frequency table; Hugging Face `tokenizers` counts
words first, then trains in memory):

1. **Word counting is the corpus-sized work** and is embarrassingly
   parallel: pretokenize every document (Arrow-batched, the same GPT-2
   pattern as ``functions/bpe.py``), explode, and hash-aggregate counts.
   This is the ONLY stage that scales with the 100 TB corpus — one scan,
   one shuffle of (word, count) pairs with map-side combine.
2. **Merge learning is vocabulary-sized** and inherently sequential
   (merge k+1's pair counts depend on merge k), so it runs on the driver
   over the aggregated table.  Zipf makes that table small in practice;
   ``max_words`` makes it small BY CONTRACT — the top-N words by
   (count desc, word asc) — so the driver holds a bounded, deterministic
   input regardless of corpus size.  Truncation is the industry trade:
   dropped singleton words contribute counts no first-N merge decision
   would flip (they are dominated by the head), and determinism is what
   the oracle needs.

The learned merges plug straight into ``functions/bpe.py``'s encoder
(same ranks-dict shape), so "train on THIS corpus, then budget THIS
corpus by its own tokenizer" is two calls.
"""

from __future__ import annotations

from collections import Counter

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import bpe


def word_frequencies(
    docs: DataFrame,
    text_col: str = "text",
    max_words: int | None = 100_000,
) -> DataFrame:
    """The corpus's pretoken frequency table: ``(word, n)``, optionally
    capped to the ``max_words`` most frequent (ties broken by word, so
    the cap is deterministic).  One Arrow-batched pretokenize pass, one
    count aggregate; the cap is a top-k, not a sort of the vocabulary.
    """

    @F.pandas_udf("array<string>")
    def pretoks(s: pd.Series) -> pd.Series:
        return s.map(lambda t: bpe.pretokenize(t or ""))

    counts = (
        docs.select(F.explode(pretoks(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("n"))
    )
    if max_words is None:
        return counts
    # top-k by (n desc, word asc): TakeOrderedAndProject, not a full sort
    return counts.orderBy(F.col("n").desc(), F.col("word")).limit(max_words)


def train_bpe_distributed(
    docs: DataFrame,
    num_merges: int,
    text_col: str = "text",
    max_words: int | None = 100_000,
) -> list[tuple[bytes, bytes]]:
    """Learn ``num_merges`` BPE merges from the corpus: distributed word
    counting (:func:`word_frequencies`), then the exact sequential merge
    loop (``functions/bpe.py::train_bpe_from_words``) over the collected
    bounded table.  Deterministic end-to-end: integer counts commute, the
    cap tie-breaks lexicographically, and the merge loop's
    (count desc, pair asc) rule has no hash dependence."""
    rows = word_frequencies(docs, text_col, max_words).collect()
    words: Counter = Counter({
        tuple(bytes([b]) for b in r["word"].encode("utf-8")): r["n"]
        for r in rows
    })
    return bpe.train_bpe_from_words(words, num_merges)


def token_counts_with_merges(
    docs: DataFrame,
    merges: list[tuple[bytes, bytes]],
    id_col: str = "doc_id",
    text_col: str = "text",
    out: str = "n_tokens",
) -> DataFrame:
    """Per-document token counts under a trained merge list — the
    "budget the corpus by its own tokenizer" read path.  The ranks dict
    rides in the Arrow UDF closure (KBs for typical merge counts;
    broadcast explicitly for 50k-merge vocabularies)."""
    ranks = {pair: rank for rank, pair in enumerate(merges)}

    @F.pandas_udf("int")
    def n_tokens(s: pd.Series) -> pd.Series:
        return s.map(lambda t: bpe.count_tokens(t or "", ranks))

    return docs.select(
        F.col(id_col), n_tokens(F.col(text_col)).alias(out)
    )
