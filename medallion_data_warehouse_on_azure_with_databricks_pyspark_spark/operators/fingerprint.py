"""Winnowing document fingerprints (rolling-hash selection) and
partial-overlap detection.

Implements the winnowing algorithm of Schleimer, Wilkerson & Aiken,
"Winnowing: Local Algorithms for Document Fingerprinting" (SIGMOD 2003)
— the fingerprint scheme behind MOSS.  Where the MinHash family scores
*whole-document* Jaccard similarity, winnowing fingerprints are *local*:
any shared substring of at least ``w + k - 1`` tokens is guaranteed to
contribute at least one common fingerprint, so a small document pasted
into a larger one is found even though whole-doc Jaccard is low.  That
containment case is the classic training-data leak (a benchmark answer
embedded in a web page; a license header carrying a document) and is the
gap this operator closes in the dedup family (``operators/dedup.py``).

Spark-first shape: every step is a Catalyst array expression — token
k-grams by positional slice, a polynomial rolling hash folded over the
gram's characters, window minima by ``array_min`` over slices — so the
whole fingerprint column is one whole-stage-codegen projection with no
UDF, no shuffle, and no Python.  The pair stage is the family's standard
inverted index: explode fingerprints, bucket-join, count shared prints
per pair — never all-pairs.

The hash is arithmetic (``h = Σ code(c)·B^i mod M`` with B=257,
M=2^31-1), NOT xxhash, precisely so a SQL oracle can replay it exactly:
DuckDB computes the identical fold with ``list_reduce``/``ord``, making
the registered query hash-green rather than rows-only.

Scale notes (100 TB): fingerprint density is ~2/(w+1) of the k-gram
stream (winnowing's guarantee: ≥1 selection per window, expected 2/(w+1)
distinct), so the inverted index carries a small constant fraction of
the token volume.  Hot fingerprints (boilerplate) are bounded by
``max_fp_freq`` exactly like ``max_shingle_freq`` in the Jaccard path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Polynomial base / modulus for the rolling gram hash.  B > any char
#: code we care about; M = Mersenne 2^31-1 keeps acc·B + code < 2^40 —
#: exact in a long under ANSI mode, and replayable in DuckDB BIGINTs.
_HASH_BASE = 257
_HASH_MOD = (1 << 31) - 1


def _gram_hash(gram: Column, base: int = _HASH_BASE) -> Column:
    """Polynomial hash of a gram string: fold ``acc*B + code(c) mod M``
    over its characters in order (``ascii`` = leading code point, one
    element per character after the empty-string split).  ``base``
    selects an independent family member (text.simhash64_poly combines
    two bases into one wide token hash)."""
    chars = F.split(gram, "")
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * base + F.ascii(c)) % _HASH_MOD,
    )


def _gram_hash_array(toks: Column, k: int) -> Column:
    """``array<long>`` of k-gram polynomial hashes over a token array —
    THE shared gram definition: winnowing takes window minima over it,
    duplicated-span detection inverts it, and both DuckDB oracles replay
    it, so it must exist exactly once.  Short docs yield one (short)
    gram — the shingle-family guard."""
    n_grams = F.greatest(F.size(toks) - k, F.lit(0)) + 1
    grams = F.transform(
        F.sequence(F.lit(0), n_grams - 1),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)),
    )
    # NOTE: _gram_hash takes an optional ``base`` kwarg, which makes it a
    # two-parameter callable — and F.transform calls two-parameter lambdas
    # as (element, index), silently binding the array index to ``base``.
    # Always wrap in an explicit one-arg lambda here.
    return F.transform(grams, lambda g: _gram_hash(g))


def positional_gram_hashes(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
) -> DataFrame:
    """``(id, pos, gram_hash, n_tokens)``: the polynomial hash of the
    token k-gram at every 0-based position, plus the document's token
    count (consumers cap span ends with it).  The positional primitive
    shared by winnowing (window minima) and duplicated-span detection
    (inverted index); the narrow input is spread to the core count
    first."""
    from .dedup import parallelize_narrow_input
    from .text import tokens

    narrow = parallelize_narrow_input(df.select(F.col(id_col), F.col(text_col)))
    return (
        narrow.withColumn("__toks", tokens(text_col))
        .withColumn("__h", _gram_hash_array(F.col("__toks"), k))
        .select(
            id_col,
            F.size("__toks").alias("n_tokens"),
            F.posexplode("__h").alias("pos", "gram_hash"),
        )
        .select(id_col, "pos", "gram_hash", "n_tokens")
    )


def duplicated_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    min_occurrences: int = 2,
) -> DataFrame:
    """Maximal duplicated token spans — the exact-substring dedup target
    of Lee et al. 2021 ("Deduplicating Training Data Makes Language
    Models Better"): any token k-gram occurring ≥ ``min_occurrences``
    times across the corpus marks its span as duplicated; overlapping and
    adjacent marked spans merge into maximal intervals per document.

    Output ``(id, span_start, span_end, span_tokens)`` with 0-based
    inclusive token indices.  Where the suffix-array formulation needs a
    global sort of the corpus, this k-gram relaxation is two shuffles —
    an inverted-index count on the gram hash and a per-doc window merge —
    at the cost of a fixed granularity ``k`` (spans shorter than ``k``
    tokens are not flagged; the paper's 50-token threshold maps to
    ``k=50``).  Repeats *within* one document count toward
    ``min_occurrences`` (so boilerplate repeated inside a single doc is
    flagged too, matching the paper's total-occurrence rule).

    The interval merge is the classic running-max window: a span starts a
    new group iff its start exceeds the running max end + 1 of all prior
    spans in the doc; SQL-expressible, so the oracle replays it exactly.
    ``occ`` is persisted for its two uses (the count aggregate and the
    marked join) so the per-character hash fold runs once, not twice.
    Span ends are capped at the document's last token index (a shorter-
    than-k doc's clamped gram must not report a span past its end).
    """
    from pyspark.sql import Window

    occ = positional_gram_hashes(df, id_col, text_col, k).persist()
    dup = (
        occ.groupBy("gram_hash")
        .agg(F.count("*").alias("__c"))
        .filter(F.col("__c") >= min_occurrences)
        .select("gram_hash")
    )
    marked = occ.join(dup, "gram_hash").select(
        F.col(id_col),
        F.col("pos").alias("__s"),
        F.least(F.col("pos") + k - 1, F.col("n_tokens") - 1).alias("__e"),
    )
    w = (
        Window.partitionBy(id_col)
        .orderBy("__s", "__e")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    grouped = marked.withColumn(
        "__new", (F.col("__s") > F.coalesce(F.max("__e").over(w), F.lit(-2)) + 1).cast("int")
    ).withColumn(
        "__grp",
        F.sum("__new").over(
            Window.partitionBy(id_col).orderBy("__s", "__e")
        ),
    )
    return (
        grouped.groupBy(id_col, "__grp")
        .agg(
            F.min("__s").alias("span_start"),
            F.max("__e").alias("span_end"),
        )
        .select(
            id_col,
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start") + 1).alias("span_tokens"),
        )
    )


def duplication_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    min_occurrences: int = 2,
) -> DataFrame:
    """Per-document duplication rollup — the filtering metric Lee et al.
    2021 actually act on: ``(id, n_tokens, dup_tokens, dup_ratio,
    n_spans)``, where ``dup_tokens`` is the union size of the document's
    duplicated spans (:func:`duplicated_spans` already merges overlaps,
    so a straight sum is exact) and ``dup_ratio = dup_tokens/n_tokens``.
    Documents with NO duplicated span appear with zeros — the rollup
    covers the whole corpus, not just flagged docs, so a threshold filter
    (``dup_ratio <= x``) can be applied directly.

    ``n_tokens`` deliberately comes from a second narrow (id, text)
    projection (``token_count`` — blank text counts 0) rather than from
    the span pipeline's per-position count (which, like the whole shingle
    family, counts blank text as one empty token): reusing the pipeline
    count would save a scan but change the blank-text semantics this
    column shares with ``doc_token_counts``."""
    from .text import token_count

    spans = duplicated_spans(df, id_col, text_col, k, min_occurrences)
    per_doc = spans.groupBy(id_col).agg(
        F.sum("span_tokens").alias("dup_tokens"),
        F.count("*").alias("n_spans"),
    )
    base = token_count(
        df.select(F.col(id_col), F.col(text_col)), text_col, out="n_tokens"
    ).select(id_col, "n_tokens")
    return (
        base.join(per_doc, id_col, "left")
        .select(
            id_col,
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.coalesce("dup_tokens", F.lit(0)).cast("long").alias("dup_tokens"),
            (
                F.coalesce("dup_tokens", F.lit(0)).cast("double")
                / F.greatest(F.col("n_tokens"), F.lit(1)).cast("double")
            ).alias("dup_ratio"),
            F.coalesce("n_spans", F.lit(0)).cast("long").alias("n_spans"),
        )
    )


def remove_duplicated_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    min_occurrences: int = 2,
) -> DataFrame:
    """Rewrite each document with its duplicated spans REMOVED — the
    acting half of Lee et al. 2021's ExactSubstr dedup (the paper cuts
    the duplicated substring out of all but one occurrence; like most
    production pipelines — e.g. C4's three-sentence rule — we cut every
    occurrence, which is the stricter, order-free variant a distributed
    pass can apply without electing a canonical survivor).

    Output ``(id, clean_text, n_tokens, removed_tokens)``:
    ``clean_text`` is the document's kept tokens (lowercased, whitespace-
    normalized — the tokenizer's canonical form, same normalization the
    whole shingle family applies) joined by single spaces; every doc in
    the corpus appears, untouched docs with ``removed_tokens = 0``.

    Spark-first shape: :func:`duplicated_spans` already merges marks into
    disjoint per-doc intervals; those are collected into ONE array per
    doc (bounded by n_tokens/k spans — thousands at most for real docs,
    never corpus-sized) and the rewrite is a single Catalyst projection:
    ``filter(sequence(0, n-1), p -> !exists(spans, s -> s.s <= p <= s.e))``
    → ``array_join(transform(kept, p -> toks[p]))``.  No UDF, no second
    shuffle beyond the span aggregation itself; the span side of the join
    is skinny (id + interval array) and broadcastable when the flagged
    set is small.

    The per-token ``exists`` scan over the doc's span array is O(spans)
    — quadratic only in the pathological all-boilerplate doc, where the
    spans have merged into one interval anyway.
    """
    spans = duplicated_spans(df, id_col, text_col, k, min_occurrences)
    per_doc = spans.groupBy(id_col).agg(
        F.collect_list(
            F.struct(
                F.col("span_start").alias("s"), F.col("span_end").alias("e")
            )
        ).alias("__spans")
    )
    toks = F.col("__toks")
    covered = lambda p: F.exists(  # noqa: E731 — name aids the plan below
        F.col("__spans"), lambda sp: (sp["s"] <= p) & (p <= sp["e"])
    )
    kept = F.filter(
        F.sequence(F.lit(0), F.size(toks) - 1),
        lambda p: ~F.coalesce(covered(p), F.lit(False)),
    )
    from .text import tokens

    return (
        df.select(F.col(id_col), F.col(text_col))
        .join(per_doc, id_col, "left")
        .withColumn("__toks", tokens(text_col))
        .select(
            id_col,
            F.array_join(
                F.transform(kept, lambda p: F.element_at(toks, p + 1)), " "
            ).alias("clean_text"),
            F.size(toks).cast("long").alias("n_tokens"),
            (F.size(toks) - F.size(kept)).cast("long").alias("removed_tokens"),
        )
    )


def winnow_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    w: int = 4,
    out: str = "fps",
) -> DataFrame:
    """``(id, fps)``: the winnowing fingerprint set of each document.

    Pipeline (all Catalyst expressions, one projection):

    1. whitespace tokens (lowercased — same normalization as the shingle
       family);
    2. positional token k-grams (short docs yield one short gram, the
       shingle-family guard);
    3. polynomial hash per gram (:func:`_gram_hash`);
    4. window minima: for every window of ``w`` consecutive gram hashes
       take ``array_min`` — winnowing's selection rule.  Selecting by
       value (not rightmost-position) keeps the fingerprint *set*
       identical to the paper's for dedup purposes while staying a pure
       array expression;
    5. distinct minima = the fingerprint set.

    The narrow input is spread to the core count first
    (``parallelize_narrow_input``) — single-file scans must not pin the
    hash pipeline to one core.
    """
    from .dedup import parallelize_narrow_input
    from .text import tokens

    narrow = parallelize_narrow_input(df.select(F.col(id_col), F.col(text_col)))
    n_windows = F.greatest(F.size(F.col("__h")) - w, F.lit(0)) + 1
    mins = F.transform(
        F.sequence(F.lit(0), n_windows - 1),
        lambda i: F.array_min(F.slice(F.col("__h"), i + 1, w)),
    )
    return (
        narrow.withColumn("__toks", tokens(text_col))
        .withColumn("__h", _gram_hash_array(F.col("__toks"), k))
        .withColumn(out, F.array_distinct(mins))
        .select(id_col, out)
    )


def fingerprint_overlap_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    w: int = 4,
    min_shared: int = 3,
    max_fp_freq: int | None = None,
    persist: bool = True,
) -> DataFrame:
    """Partial-overlap candidate pairs by shared winnowing fingerprints.

    Output ``(left_id, right_id, shared, containment)`` with
    ``left_id < right_id``: ``shared`` = common fingerprint count,
    ``containment`` = shared / min(|fps_l|, |fps_r|) — ≈1.0 when the
    smaller document is wholly contained in the larger, regardless of how
    big the larger one is (the case whole-doc Jaccard scores near 0).

    Inverted-index shape: fingerprints explode once, pairs form inside
    fingerprint buckets only, and per-pair work is a count aggregate —
    the corpus text is never self-joined.  ``max_fp_freq`` drops
    boilerplate fingerprints shared by more than that many documents
    (the hot-bucket cap, same contract as ``max_shingle_freq``).

    ``persist=False`` skips the fingerprint-frame persist (trading one
    extra fingerprint pass for a SQL cache that cannot accumulate —
    same contract as ``minhash_pairs_against_index.persist_shard``;
    use it from long-running per-batch loops).
    """
    fps = winnow_fingerprints(df, id_col, text_col, k, w)
    if persist:
        fps = fps.persist()
    sizes = fps.select(
        F.col(id_col), F.size("fps").alias("__n_fp")
    )
    inv = fps.select(F.col(id_col), F.explode("fps").alias("fp"))
    if max_fp_freq is not None:
        hot = (
            inv.groupBy("fp")
            .agg(F.count("*").alias("__c"))
            .filter(F.col("__c") > max_fp_freq)
            .select("fp")
        )
        inv = inv.join(F.broadcast(hot), "fp", "left_anti")
    a = inv.select(F.col(id_col).alias("left_id"), "fp")
    b = inv.select(F.col(id_col).alias("right_id"), "fp")
    shared = (
        a.join(b, "fp")
        .filter(F.col("left_id") < F.col("right_id"))
        .groupBy("left_id", "right_id")
        .agg(F.count("*").alias("shared"))
        .filter(F.col("shared") >= min_shared)
    )
    return (
        shared.join(
            sizes.select(
                F.col(id_col).alias("left_id"), F.col("__n_fp").alias("__nl")
            ),
            "left_id",
        )
        .join(
            sizes.select(
                F.col(id_col).alias("right_id"), F.col("__n_fp").alias("__nr")
            ),
            "right_id",
        )
        .select(
            "left_id",
            "right_id",
            "shared",
            (
                F.col("shared")
                / F.least(F.col("__nl"), F.col("__nr")).cast("double")
            ).alias("containment"),
        )
    )
