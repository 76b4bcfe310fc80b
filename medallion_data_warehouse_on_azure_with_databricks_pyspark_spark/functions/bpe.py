"""Byte-level BPE tokenization for length budgeting.

The curation surface needs token counts that track what a real LLM
tokenizer would produce (reference parity: length filtering in
training-data pipelines; the regex proxy in ``operators/text.py`` is the
SQL-expressible fallback).  This module implements the actual byte-pair
encoding algorithm — the same greedy lowest-rank merge loop used by
GPT-2's public ``encoder.py`` and tiktoken (public knowledge; algorithm
from Sennrich, Haddow & Birch, "Neural Machine Translation of Rare Words
with Subword Units", ACL 2016):

* **pretokenizer** — stdlib-``re`` transcription of the public GPT-2
  pattern (``'s|'t|'re|'ve|'m|'ll|'d| ?\\p{L}+| ?\\p{N}+|
  ?[^\\s\\p{L}\\p{N}]+|\\s+(?!\\S)|\\s+``): contraction suffixes,
  space-prefixed letter runs, digit runs, symbol runs, trailing/inner
  whitespace;
* **encoder** — each pretoken starts as its UTF-8 bytes; adjacent pairs
  merge greedily in ascending rank order until no ranked pair remains;
* **merge table** — trained deterministically at import from the embedded
  seed corpus below (the trainer is ~30 lines and reproducible:
  count-desc / pair-lexicographic tie-break).  For tiktoken-compatible
  budgets swap in a real vocabulary via :func:`load_merges` on the
  standard ``merges.txt`` format — counts then match that tokenizer
  exactly, because the algorithm is the same.

Scale shape: the ranks dict rides inside the Arrow-vectorized UDF closure
(~KBs here; broadcast it explicitly if you load a 50k-merge vocabulary).
Counting is embarrassingly parallel — no shuffle, no driver data.
"""

from __future__ import annotations

import re
from collections import Counter
from functools import lru_cache

# GPT-2 pretokenizer, stdlib re: [^\W\d_] ≈ \p{L}; \d ≈ \p{N};
# (?:[^\w\s]|_) ≈ [^\s\p{L}\p{N}] (underscore is \w but not a letter).
_PRETOKEN = re.compile(
    r"'s|'t|'re|'ve|'m|'ll|'d"
    r"| ?[^\W\d_]+| ?\d+| ?(?:[^\w\s]|_)+"
    r"|\s+(?!\S)|\s+",
    re.UNICODE,
)

#: Deterministic training corpus for the default merge table.  Plain
#: English prose (written for this module) — enough to learn the common
#: English byte pairs ("th", "he", "in", " t", "er", ...) that dominate
#: real BPE vocabularies' first merges.
_SEED_CORPUS = (
    "The quick brown fox jumps over the lazy dog. "
    "The engine reads the data and the tables in the warehouse. "
    "It is the most common words that the tokenizer sees in the text: "
    "the, of, and, a, to, in, is, was, he, for, on, are, as, with, his, "
    "they, I, at, be, this, have, from, or, one, had, by, word, but, not, "
    "what, all, were, we, when, your, can, said, there, use, an, each, "
    "which, she, do, how, their, if, will, up, other, about, out, many, "
    "then, them, these, so, some, her, would, make, like, him, into, time, "
    "has, look, two, more, write, go, see, number, no, way, could, people, "
    "my, than, first, water, been, call, who, oil, its, now, find, long, "
    "down, day, did, get, come, made, may, part. "
    "Streaming queries aggregate partitioned records while distributed "
    "workers shuffle, sort, join and deduplicate documents at scale. "
    "Numbers like 1024 and 2048 and symbols like #, $, % appear too."
)

_NUM_MERGES = 384


def pretokenize(text: str) -> list[str]:
    """Split text with the GPT-2-style pretokenizer (lossless: the pieces
    concatenate back to the input)."""
    return _PRETOKEN.findall(text)


def train_bpe(corpus: list[str], num_merges: int) -> list[tuple[bytes, bytes]]:
    """Learn a merge list from ``corpus`` (Sennrich-style, byte-level).

    Deterministic: the next merge is the pair with the highest count,
    ties broken by lexicographically smallest (bytes, bytes) pair — no
    dict-order or hash dependence.
    """
    words: Counter[tuple[bytes, ...]] = Counter()
    for text in corpus:
        for tok in pretokenize(text):
            words[tuple(bytes([b]) for b in tok.encode("utf-8"))] += 1
    return train_bpe_from_words(words, num_merges)


def train_bpe_from_words(
    words: Counter, num_merges: int
) -> list[tuple[bytes, bytes]]:
    """The merge-learning loop over an already-aggregated word-frequency
    table (``{byte-tuple word: count}``) — the sequential stage of BPE
    training, split out so distributed callers
    (``operators/tokenizer.py``) can aggregate the corpus-sized word
    counts in Spark and learn merges from the bounded table.  Identical
    determinism contract as :func:`train_bpe`."""
    words = Counter(words)
    merges: list[tuple[bytes, bytes]] = []
    for _ in range(num_merges):
        pairs: Counter[tuple[bytes, bytes]] = Counter()
        for w, c in words.items():
            for i in range(len(w) - 1):
                pairs[(w[i], w[i + 1])] += c
        if not pairs:
            break
        top = max(pairs.values())
        best = min(p for p, c in pairs.items() if c == top)
        merges.append(best)
        merged = best[0] + best[1]
        new_words: Counter[tuple[bytes, ...]] = Counter()
        for w, c in words.items():
            out: list[bytes] = []
            i = 0
            while i < len(w):
                if i + 1 < len(w) and w[i] == best[0] and w[i + 1] == best[1]:
                    out.append(merged)
                    i += 2
                else:
                    out.append(w[i])
                    i += 1
            new_words[tuple(out)] += c
        words = new_words
    return merges


def load_merges(merges_txt: str) -> dict[tuple[bytes, bytes], int]:
    """Parse the standard ``merges.txt`` format (one ``left right`` pair
    per line, rank = line order; ``#version`` header and blank lines
    skipped) into a ranks dict for :func:`count_tokens`.

    Note: real GPT-2 ``merges.txt`` files are written in the byte-to-
    unicode remapped alphabet (``Ġ`` = space, etc.); this loader applies
    the public remapping so a stock file works unmodified.
    """
    b2u = _bytes_to_unicode()
    u2b = {u: bytes([b]) for b, u in b2u.items()}

    def decode(piece: str) -> bytes:
        return b"".join(u2b.get(ch, ch.encode("utf-8")) for ch in piece)

    ranks: dict[tuple[bytes, bytes], int] = {}
    rank = 0
    for line in merges_txt.splitlines():
        line = line.rstrip("\n")
        if not line or line.startswith("#"):
            continue
        left, sep, right = line.partition(" ")
        if not sep:
            continue
        ranks[(decode(left), decode(right))] = rank
        rank += 1
    return ranks


def _bytes_to_unicode() -> dict[int, str]:
    """GPT-2's public byte↔unicode remapping (printable stand-ins for
    control/whitespace bytes so merges.txt stays one-token-per-column)."""
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("¡"), ord("¬") + 1))
        + list(range(ord("®"), ord("ÿ") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


@lru_cache(maxsize=1)
def default_ranks() -> dict[tuple[bytes, bytes], int]:
    """The embedded merge table: ``_NUM_MERGES`` merges trained on
    ``_SEED_CORPUS`` at import (deterministic, ~ms)."""
    merges = train_bpe([_SEED_CORPUS], _NUM_MERGES)
    return {pair: rank for rank, pair in enumerate(merges)}


def encode_pieces(token: str, ranks: dict[tuple[bytes, bytes], int]) -> list[bytes]:
    """BPE-encode one pretoken: start from single bytes, repeatedly merge
    the adjacent pair with the lowest rank (GPT-2 encoder.py semantics)."""
    parts = [bytes([b]) for b in token.encode("utf-8")]
    while len(parts) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(parts) - 1):
            r = ranks.get((parts[i], parts[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank = r
                best_i = i
        if best_rank is None:
            break
        parts[best_i:best_i + 2] = [parts[best_i] + parts[best_i + 1]]
    return parts


def count_tokens(text: str, ranks: dict[tuple[bytes, bytes], int] | None = None) -> int:
    """Number of BPE tokens in ``text`` under ``ranks`` (default: the
    embedded table)."""
    if ranks is None:
        ranks = default_ranks()
    return sum(len(encode_pieces(tok, ranks)) for tok in pretokenize(text))
