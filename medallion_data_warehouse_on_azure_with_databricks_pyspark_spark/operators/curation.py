"""Corpus-preparation operators: chunking, deterministic sampling/splits,
token-budget packing.

The last mile of a training-data pipeline (no reference counterpart —
extension surface): after dedup/quality filtering, documents are chunked to
model context windows, sources are mixed at configured rates, rows are
assigned reproducible train/val/test splits, and chunks are packed into
fixed token budgets.  Everything here is deterministic pure-Catalyst
expression work — re-running the pipeline on a different cluster layout
yields byte-identical corpora, which is the property curation pipelines
live or die by.

Scale notes (100 TB):

* :func:`chunk_documents` — one Project + one Generate (posexplode); the
  fan-out is ~n_tokens/stride rows per doc with no shuffle.  Chunk text is
  re-joined from the token array, so the scan reads ``text`` once.
* :func:`mixture_sample` — stateless per-row hash filter (md5 of the id —
  NOT ``rand()``: resampling must not depend on partitioning, retries, or
  row order).  Filters are pushed into whatever scan feeds them.
* :func:`assign_split` — same hash, disjoint hex window, so the split is
  independent of the sampling decision.
* :func:`pack_tokens` — running token sum per group (one shuffle + sort
  per group key).  A global greedy pack is inherently sequential per
  group; at 100 TB pack *within* deterministic sub-shards (add a shard
  column to ``group_cols``) to keep per-task state bounded — the budget
  boundary error is at most one document per shard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

TWO32 = 1 << 32


def _hash_u32(col, lo: int = 1) -> F.Column:
    """First (or ``lo``-offset) 8 hex digits of md5(id) as a uint32-ranged
    long — deterministic, partition-independent, identical in any engine
    with md5/substr/hex-parse."""
    return F.conv(F.substring(F.md5(col.cast("string")), lo, 8), 16, 10).cast(
        "long"
    )


def chunk_documents(
    df: DataFrame,
    size: int = 32,
    stride: int = 24,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split each document into overlapping ``size``-token windows every
    ``stride`` tokens (the standard context-window chunker; ``stride <
    size`` gives overlap).  Output: ``(id, chunk_id, chunk_text,
    chunk_tokens)``; every document yields at least one chunk."""
    if not (0 < stride and 0 < size):
        raise ValueError("size and stride must be positive")
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    starts = F.sequence(
        F.lit(0), F.greatest(F.size(toks) - 1, F.lit(0)), F.lit(stride)
    )
    ex = df.select(
        F.col(id_col),
        toks.alias("__t"),
        F.posexplode(starts).alias("__i", "__s"),
    )
    return ex.select(
        id_col,
        (F.col("__s") / stride).cast("long").alias("chunk_id"),
        F.array_join(F.slice("__t", F.col("__s") + 1, F.lit(size)), " ").alias(
            "chunk_text"
        ),
        F.least(F.lit(size), F.size("__t") - F.col("__s"))
        .cast("long")
        .alias("chunk_tokens"),
    )


def mixture_sample(
    df: DataFrame,
    rates: dict[str, float],
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """Deterministic per-source downsampling: keep a row iff
    ``hash_u32(id) < rate(source)·2³²``.  Sources absent from ``rates``
    are dropped (rate 0).  The id hash makes the decision a pure function
    of the row — stable under retries, repartitioning, and incremental
    re-runs, unlike ``DataFrame.sample``/``sampleBy``."""
    u = _hash_u32(F.col(id_col))
    thr = F.lit(0)
    for src, rate in sorted(rates.items()):
        thr = F.when(F.col(source_col) == src, F.lit(int(rate * TWO32))).otherwise(
            thr
        )
    return df.filter(u < thr)


def assign_split(
    df: DataFrame,
    id_col: str = "doc_id",
    out: str = "split",
    train: int = 80,
    val: int = 10,
) -> DataFrame:
    """Reproducible train/val/test assignment from a *disjoint* hex window
    of the same id hash (independent of :func:`mixture_sample`'s decision).
    Percentages are integer percent points; test gets the remainder."""
    bucket = _hash_u32(F.col(id_col), lo=9) % 100
    return df.withColumn(
        out,
        F.when(bucket < train, F.lit("train"))
        .when(bucket < train + val, F.lit("val"))
        .otherwise(F.lit("test")),
    )


def pack_tokens(
    df: DataFrame,
    budget: int = 2048,
    group_col: str = "source",
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
) -> DataFrame:
    """Greedy sequential packing: within each group (ordered by id), a
    document lands in pack ``floor(tokens_before_it / budget)`` — the
    standard streaming sequence-packing rule (a document may straddle a
    budget boundary; the next pack starts at the next document).  Output
    adds ``pack_id`` and ``pack_pos`` (1-based position inside the pack).
    Pure integer window math — bit-identical on any engine."""
    w = Window.partitionBy(group_col).orderBy(id_col)
    with_cum = df.withColumn("__cum", F.sum(tokens_col).over(w))
    packed = with_cum.withColumn(
        "pack_id",
        F.floor((F.col("__cum") - F.col(tokens_col)) / budget).cast("long"),
    )
    wp = Window.partitionBy(group_col, "pack_id").orderBy(id_col)
    return packed.withColumn(
        "pack_pos", F.row_number().over(wp).cast("long")
    ).drop("__cum")


def decontaminate_flags(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
) -> DataFrame:
    """Benchmark decontamination: flag corpus documents sharing any word
    n-gram with an evaluation set — the train/test-overlap hygiene step
    every serious LLM corpus runs (13-gram overlap is the convention
    published with GPT-3 and reused by later corpus papers).

    Output per corpus document: ``n_grams`` (its distinct n-gram count),
    ``n_contaminated_grams`` (how many of those appear anywhere in the
    benchmark set), and ``contaminated`` (any overlap at all).  Callers
    drop or audit flagged rows; the thresholding policy is theirs.

    Scale shape (100 TB corpus, MB-scale eval sets): the benchmark's
    distinct-gram set is tiny and **broadcast**, so the corpus is scanned
    **once**: the shingle array is materialized via ``dedup.with_shingles``
    (two-step projection — tokenization runs once per row, not once per
    shingle index), and both the exploded gram stream and the per-doc
    ``n_grams`` total derive from that one column, aggregated back together
    in a single map-side-combinable ``groupBy(id)``.  The narrow
    (id, text) corpus projection is spread to the cluster's core count
    first (``parallelize_narrow_input``) — a small single-file scan
    otherwise pins the whole CPU-heavy shingle pipeline to one core; a
    properly-split 100 TB table passes through untouched.  (Together with
    the session-level InferFiltersFromGenerate exclusion — see
    ``session.ENGINE_CONF`` — this took the sf0.1 query 3.6 → 1.0 s.)
    Shingle semantics (distinct grams, short docs yield one short shingle)
    match the dedup family's.
    """
    from . import dedup

    bench_grams = (
        dedup.with_shingles(benchmark, bench_text_col, n, out="__sh")
        .select(F.explode("__sh").alias("gram"))
        .distinct()
    )
    # One corpus scan: explode the materialized shingle column, carrying
    # its size alongside, so totals and hit-counts come from the same pass.
    narrow = dedup.parallelize_narrow_input(
        corpus.select(F.col(id_col), F.col(text_col))
    )
    doc_grams = dedup.with_shingles(narrow, text_col, n, out="__sh").select(
        F.col(id_col),
        F.size("__sh").alias("__n_grams"),
        F.explode("__sh").alias("gram"),
    )
    flagged = (
        doc_grams.join(
            F.broadcast(bench_grams.withColumn("__hit", F.lit(1))), "gram", "left"
        )
        .groupBy(id_col)
        .agg(
            F.first("__n_grams").alias("n_grams"),
            F.sum(F.coalesce(F.col("__hit"), F.lit(0))).alias(
                "n_contaminated_grams"
            ),
        )
    )
    n_hit = F.col("n_contaminated_grams").cast("long")
    return flagged.select(
        id_col,
        F.col("n_grams").cast("long").alias("n_grams"),
        n_hit.alias("n_contaminated_grams"),
        (n_hit > 0).alias("contaminated"),
    )


#: The "must contain ≥2 of these" word list from the Gopher/MassiveWeb
#: quality rules (Rae et al. 2021, appendix A; reused by RefinedWeb/Dolma).
GOPHER_REQUIRED_WORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality_flags(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_word_ratio: float = 0.1,
    max_bullet_line_ratio: float = 0.9,
    max_ellipsis_line_ratio: float = 0.3,
    min_alpha_word_ratio: float = 0.8,
    min_required_words: int = 2,
    required_words: tuple[str, ...] = GOPHER_REQUIRED_WORDS,
) -> DataFrame:
    """The Gopher/MassiveWeb document-quality rules (Rae et al. 2021,
    appendix A) as one Catalyst projection — the published rule set most
    large-scale corpus pipelines start from (RefinedWeb, Dolma).

    Per document: one boolean per rule plus the conjunction
    ``gopher_pass``.  Rules (defaults = the paper's):

    * ``ok_word_count``      — 50 ≤ words ≤ 100,000
    * ``ok_mean_word_len``   — 3 ≤ mean word length ≤ 10
    * ``ok_symbol_ratio``    — (# + …) occurrences / words ≤ 0.1
    * ``ok_bullet_lines``    — ≤ 90% of lines start with a bullet
    * ``ok_ellipsis_lines``  — ≤ 30% of lines end with an ellipsis
    * ``ok_alpha_words``     — ≥ 80% of words contain a letter
    * ``ok_required_words``  — ≥ 2 of the 8 required common words
      (``required_words`` — the paper's English function words by
      default; corpora in another language/domain supply their own)

    Flags are returned (not filtered) so callers audit before dropping —
    same contract as ``decontaminate_flags``.  Everything is plain
    string/array arithmetic: one scan, no UDF, no shuffle; ratios are
    explicit double divisions so a SQL oracle agrees bit-for-bit.
    """
    from .text import tokens

    c = F.col(text_col)
    toks = F.col("__toks")
    n_words = F.size(toks)
    n_words_d = n_words.cast("double")
    mean_wl = (
        F.aggregate(
            F.transform(toks, lambda t: F.length(t).cast("double")),
            F.lit(0.0),
            lambda a, x: a + x,
        )
        / n_words_d
    )
    n_hash = F.length(c) - F.length(F.regexp_replace(c, r"#", ""))
    n_ellipsis = (
        F.length(c) - F.length(F.regexp_replace(c, r"\.\.\.", ""))
    ) / F.lit(3)
    symbol_ratio = (n_hash + n_ellipsis).cast("double") / n_words_d
    lines = F.split(c, r"\n")
    n_lines = F.size(lines).cast("double")
    bullet_lines = F.size(
        F.filter(lines, lambda l: F.trim(l).rlike(r"^[-*•]"))
    ).cast("double")
    ellipsis_lines = F.size(
        F.filter(lines, lambda l: F.trim(l).rlike(r"\.\.\.$"))
    ).cast("double")
    alpha_words = F.size(
        F.filter(toks, lambda t: t.rlike(r"[a-z]"))
    ).cast("double")
    required = F.array(*[F.lit(w) for w in required_words])
    n_required = F.size(F.array_intersect(F.array_distinct(toks), required))

    flags = {
        "ok_word_count": (n_words >= min_words) & (n_words <= max_words),
        "ok_mean_word_len": (mean_wl >= min_mean_word_len)
        & (mean_wl <= max_mean_word_len),
        "ok_symbol_ratio": symbol_ratio <= max_symbol_word_ratio,
        "ok_bullet_lines": bullet_lines / n_lines <= max_bullet_line_ratio,
        "ok_ellipsis_lines": ellipsis_lines / n_lines
        <= max_ellipsis_line_ratio,
        "ok_alpha_words": alpha_words / n_words_d >= min_alpha_word_ratio,
        "ok_required_words": n_required >= min_required_words,
    }
    out = df.withColumn("__toks", tokens(text_col)).withColumns(flags)
    gopher_pass = F.lit(True)
    for name in flags:
        gopher_pass = gopher_pass & F.col(name)
    return out.withColumn("gopher_pass", gopher_pass).select(
        id_col, *flags.keys(), "gopher_pass"
    )


def cap_per_group(
    df: DataFrame,
    cap: int,
    group_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic per-group document cap — the domain rate-limiting
    step of web-corpus pipelines (no single source/domain may dominate
    the mixture, a standard control in C4/MassiveWeb-style curation).

    Selection is hash-ranked, not arbitrary: each group keeps its ``cap``
    rows with the smallest ``md5(id)`` rank (id tie-break), so the
    surviving set is a pure function of the data — identical under
    retries, repartitioning, and incremental re-runs, and statistically a
    uniform subsample of the group (unlike "first cap rows", which bakes
    in scan order).

    Scale shape: selection runs through ``similarity.grouped_topk`` — a
    two-phase per-group k-heap whose exchange carries at most
    ``partitions × groups × cap`` candidate id rows, never the corpus —
    then a left-semi join restores the full surviving rows.  Contrast a
    ``row_number`` window, which would shuffle every row of the 100 TB
    table to rank it.
    """
    from .similarity import grouped_topk

    if cap < 1:
        raise ValueError("cap must be >= 1")
    scored = df.select(F.col(id_col), F.col(group_col)).withColumn(
        "__score", -_hash_u32(F.col(id_col)).cast("double")
    )
    keep = grouped_topk(scored, group_col, id_col, cap, score_col="__score")
    return df.join(
        keep.select(id_col), id_col, "left_semi"
    )


def hashed_classifier_score(
    df: DataFrame,
    weights: list[float],
    text_col: str = "text",
    id_col: str = "doc_id",
    ngrams: tuple[int, ...] = (1, 2),
    threshold: float = 0.0,
    out: str = "clf_score",
) -> DataFrame:
    """fastText-style hashed linear text classifier (Joulin et al. 2016):
    the classifier-based filtering step of modern curation pipelines
    (CCNet/DCLM/FineWeb-Edu shape) as a single Catalyst projection.

    ``score = (1/|F|) · Σ_{f∈F} weights[poly_hash(f) mod B]`` over the
    document's token n-gram features (feature hashing — no vocabulary,
    fixed-width weight table).  ``weights`` is the trained dense table
    (bucket-indexed, ``B = len(weights)``), inlined into the plan as a
    literal array: at any corpus size the model ships with the query, no
    join, no shuffle, no UDF.  The linear score is emitted rather than the
    sigmoid — monotone-equivalent for ranking/thresholding, and exactly
    replayable cross-engine (libm ``exp`` is not).

    Output: input columns + ``n_features``, ``out``, and ``keep``
    (``score >= threshold``).  Token hashes use the arithmetic polynomial
    family (``fingerprint._gram_hash``), so an oracle replays every
    feature bucket bit-for-bit.
    """
    from .fingerprint import _gram_hash_array
    from .text import tokens

    if not weights:
        raise ValueError("weights table must be non-empty")
    n_buckets = len(weights)
    wlit = F.array(*[F.lit(float(w)) for w in weights])
    toks = tokens(text_col)
    feats = F.concat(
        *[_gram_hash_array(toks, k) for k in ngrams]
    )
    contribs = F.transform(
        feats, lambda h: F.element_at(wlit, (h % n_buckets).cast("int") + 1)
    )
    score = F.aggregate(contribs, F.lit(0.0), lambda a, x: a + x) / F.size(
        contribs
    )
    return df.withColumns(
        {
            "n_features": F.size(contribs).cast("long"),
            out: score,
            "keep": score >= F.lit(float(threshold)),
        }
    )


def ngram_lm_fluency(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 1.0,
    out: str = "lm_score",
) -> DataFrame:
    """Bigram-LM fluency scoring — the CCNet/Wenzek et al. 2020
    perplexity-filter shape, reformulated log-free.

    Trains add-``alpha``-smoothed bigram conditionals on the corpus ITSELF
    (self-scoring: boilerplate and gibberish score low against the
    corpus's own statistics, and no external LM means no contamination
    vector), then scores each document by the **arithmetic mean** of
    ``p(w_i | w_{i-1})``.  Log-free on purpose: ``ln`` is libm (not
    bit-reproducible across engines), while count ratios and ordered
    sums are exact IEEE ops — same trade the BM25 lane makes with its
    rational idf.  Low mean-conditional-probability ⇒ unusual token
    transitions ⇒ the same documents a perplexity filter flags.

    Scale: two grouped counts (bigram, context) + one equi-join of the
    corpus bigram stream against the count table — the standard
    distributed LM-count shape; per-doc state afterwards is the doc's own
    bigram probabilities (bounded by doc length), folded in position
    order for bit-reproducibility.  Vocabulary size is ONE scalar
    collected driver-side.

    Output: ``(id, n_bigrams, out)``; docs with <2 tokens score NULL.
    """
    from .text import tokens

    toks = tokens(text_col)
    # zip(t[1:n-1], t[2:n]) — F.sequence can't express this (start > stop
    # yields a DESCENDING sequence for 1-token docs); slice lengths of 0
    # give clean empty arrays instead.
    n1 = F.greatest(F.size(toks) - 1, F.lit(0))
    bigrams = F.zip_with(
        F.slice(toks, F.lit(1), n1),
        F.slice(toks, F.lit(2), n1),
        lambda p, w: F.struct(p.alias("prev"), w.alias("w")),
    )
    bi = df.select(
        F.col(id_col), F.posexplode_outer(bigrams).alias("pos", "bg")
    ).select(
        id_col, "pos", F.col("bg.prev").alias("prev"), F.col("bg.w").alias("w")
    )
    pairs = bi.filter(F.col("prev").isNotNull())
    c2 = pairs.groupBy("prev", "w").agg(F.count(F.lit(1)).alias("c2"))
    c1 = c2.groupBy("prev").agg(F.sum("c2").alias("c1"))
    vocab_size = (
        df.select(F.explode(toks).alias("tok")).select("tok").distinct().count()
    )
    # enrich the (small) bigram-count table with its context total FIRST —
    # a counts×counts join — so the corpus bigram stream shuffles exactly
    # once, against one enriched table, instead of twice
    counts = c2.join(c1, "prev")
    scored = (
        pairs.join(counts, ["prev", "w"])
        .withColumn(
            "__p",
            (F.col("c2") + F.lit(float(alpha)))
            / (F.col("c1") + F.lit(float(alpha)) * F.lit(float(vocab_size))),
        )
    )
    per_doc = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("pos", "__p"))),
            F.lit(0.0),
            lambda a, e: a + e["__p"],
        ).alias("__s"),
    )
    return (
        df.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_bigrams"), F.lit(0)).cast("long").alias("n_bigrams"),
            (F.col("__s") / F.col("n_bigrams")).alias(out),
        )
    )


def leakage_safe_splits(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    out: str = "split",
    train: int = 80,
    val: int = 10,
) -> DataFrame:
    """Train/val/test assignment that near-duplicates cannot straddle.

    Plain per-document hashing (:func:`assign_split`) leaks: two near-dup
    documents can land in train AND test, and the eval set silently
    contains training data — the split-contamination failure mode dedup
    pipelines exist to prevent.  Here the split decision hashes the
    near-dup CLUSTER label (min-id connected component of ``pairs``, via
    ``dedup.propagate_labels``), so every member of a cluster — and every
    future member, since the min-id label is stable under growth until a
    smaller id joins — receives the same split; singleton documents hash
    their own id, which keeps the 80/10/10 proportions on the (dominant)
    unpaired mass.

    Output: input columns + ``split_group`` (the cluster label) + ``out``.
    One label propagation over the pair graph (≪ corpus) + one left join
    back to the corpus — the full table is scanned once.
    """
    from .dedup import propagate_labels

    labels = propagate_labels(pairs).withColumnRenamed("src", id_col)
    with_label = df.join(labels, id_col, "left").withColumn(
        "split_group", F.coalesce(F.col("label"), F.col(id_col))
    ).drop("label")
    return assign_split(with_label, id_col="split_group", out=out,
                        train=train, val=val)


def temperature_mixture(
    df: DataFrame,
    target_frac: float = 0.5,
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """τ=0.5 temperature sampling (the multilingual-mixing rule of
    XLM-R/mT5: sample sources ∝ n_s^τ, flattening the head and
    upweighting rare sources): derive per-source keep rates
    ``min(1, target·√n_s / (Σ√n · n_s))`` from the corpus itself, then
    apply the same deterministic md5-window keep rule as
    :func:`mixture_sample` — the whole decision is a pure function of
    the row, stable under retries and repartitioning.

    Bit-exactness across engines is engineered, not hoped for: τ is
    fixed at 0.5 because IEEE ``sqrt`` is correctly rounded everywhere
    (general ``pow`` is not); per-source weights are FIXED-POINT
    (``floor(√n · 2²⁰)`` as int) so their SUM is integer — exact and
    order-free — and the final rate is a single mul/div tree over exact
    integers, one correctly-rounded step each.  Rates cap at 1.0:
    sampling without replacement cannot upweight past a full pass —
    repeating rare sources beyond 1 epoch is a repetition-factor
    decision, not a sampling one.

    One count aggregation + one broadcast join + a stateless filter;
    the 100 TB table is scanned twice (count, filter), shuffled never.
    Output adds ``n_source`` and ``rate`` for audit."""
    counts = df.groupBy(source_col).agg(F.count("*").alias("__n"))
    counts = counts.withColumn(
        "__w",
        F.floor(F.sqrt(F.col("__n").cast("double")) * F.lit(float(1 << 20))).cast(
            "long"
        ),
    )
    # break the shared-lineage ambiguity (tot derives from counts):
    # materialize the two exact integer totals — a bounded 1-row collect,
    # same contract as the pivot/codebook collects.  Totals get names
    # that are NOT case-variants of the per-source columns: Spark's
    # case-insensitive resolver makes withColumn("__N") REPLACE "__n".
    tot_row = counts.agg(
        F.sum("__n").alias("tn"), F.sum("__w").alias("tw")
    ).first()
    tot_n, tot_w = int(tot_row["tn"]), int(tot_row["tw"])
    target = F.floor(
        F.lit(float(target_frac)) * F.lit(tot_n).cast("double")
    ).cast("long")
    rates = (
        counts.withColumn(
            "rate",
            F.least(
                F.lit(1.0),
                (target.cast("double") * F.col("__w").cast("double"))
                / (F.lit(tot_w).cast("double") * F.col("__n").cast("double")),
            ),
        )
        .withColumn(
            "__thr", F.floor(F.col("rate") * F.lit(4294967296.0)).cast("long")
        )
        .select(source_col, F.col("__n").alias("n_source"), "rate", "__thr")
    )
    u = _hash_u32(F.col(id_col))
    return (
        df.join(F.broadcast(rates), source_col)
        .filter(u < F.col("__thr"))
        .drop("__thr")
    )


def token_budget_epochs(
    df: DataFrame,
    budget_tokens: int,
    max_epochs: int = 4,
    source_col: str = "source",
    tokens_col: str = "n_tokens",
) -> DataFrame:
    """Training-mix planning: given a global token budget ``B`` and τ=0.5
    source weights derived from the corpus itself (√T_s fixed-point, the
    same engineered-exact scheme as :func:`temperature_mixture`), how
    many EPOCHS of each source does the run consume?  ``target_s =
    B·w_s/W``, ``epochs_s = target_s/T_s`` capped at ``max_epochs``
    (repetition beyond a few epochs degrades models faster than it adds
    tokens — the cap is the knob), with the shortfall reported so the
    caller can re-normalize or widen sources.

    Everything is INTEGER: token sums, fixed-point weights, floor
    divisions (``DIV``) — so the plan is bit-identical in any engine.
    Output per source: corpus tokens, target tokens, epochs in
    milli-epochs (floor(1000·target/T)), effective tokens after the cap,
    and the repetition-limited flag.  One aggregate + a 1-row collect —
    a PLAN, not a data pass; 64-bit products bound B·w ≲ 2⁶³ (switch the
    two products to DECIMAL(38,0) beyond ~10¹³ budget tokens).
    """
    if budget_tokens <= 0 or max_epochs < 1:
        raise ValueError("token_budget_epochs: need budget > 0, epochs >= 1")
    t = df.groupBy(source_col).agg(F.sum(tokens_col).alias("corpus_tokens"))
    t = t.withColumn(
        "__w",
        F.floor(
            F.sqrt(F.col("corpus_tokens").cast("double")) * F.lit(float(1 << 20))
        ).cast("long"),
    )
    tot_w = int(t.agg(F.sum("__w").alias("tw")).first()["tw"])
    target = F.expr(f"({int(budget_tokens)} * __w) DIV {tot_w}")
    return (
        t.withColumn("target_tokens", target)
        .withColumn(
            "epochs_milli",
            F.expr("(1000 * target_tokens) DIV corpus_tokens"),
        )
        .withColumn(
            "effective_tokens",
            F.least(
                F.col("target_tokens"),
                F.col("corpus_tokens") * F.lit(int(max_epochs)),
            ),
        )
        .withColumn(
            "repetition_limited",
            F.col("target_tokens")
            > F.col("corpus_tokens") * F.lit(int(max_epochs)),
        )
        .select(
            source_col, "corpus_tokens", "target_tokens",
            "epochs_milli", "effective_tokens", "repetition_limited",
        )
    )
