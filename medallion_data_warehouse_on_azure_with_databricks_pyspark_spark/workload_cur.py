"""Corpus-preparation workload queries (chunking, mixing/splits, packing,
resampling) with bit-exact DuckDB oracles.

Determinism strategy: all four families are integer / string-hash math —
no float accumulation anywhere — so the only oracle subtlety is hex
parsing (md5 prefix → uint32 via per-digit ``strpos`` arithmetic, the same
trick the multimodal oracle uses for sha256 lanes)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators import curation, temporal, text
from .operators import dedup as dedup_ops
from .workload import load, load_events, query

_CHUNK_SIZE, _CHUNK_STRIDE = 32, 24


# shared with workload_llm via the leaf module (circular-import-safe)
from .oracle_fragments import hex8 as _hex8_sql  # noqa: E402


@query(
    "doc_chunks",
    oracle=f"""
    WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS tk
               FROM documents),
    s AS (SELECT doc_id, tk,
                 unnest(range(0, greatest(len(tk) - 1, 0) + 1, {_CHUNK_STRIDE}))
                   AS st
          FROM t)
    SELECT doc_id,
           st // {_CHUNK_STRIDE} AS chunk_id,
           array_to_string(tk[st + 1 : st + {_CHUNK_SIZE}], ' ') AS chunk_text,
           least({_CHUNK_SIZE}, len(tk) - st) AS chunk_tokens
    FROM s
    """,
)
def doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking (``operators/curation.py chunk_documents``):
    32-token windows every 24 tokens — map-side Generate, no shuffle."""
    docs = load(spark, sf_dir, "documents")
    return curation.chunk_documents(
        docs, size=_CHUNK_SIZE, stride=_CHUNK_STRIDE
    )


#: Per-source sampling rates for the mixture demo (cycled over the driver's
#: 20 sources).
MIX_RATES: dict[str, float] = {
    f"src{i}": [1.0, 0.75, 0.5, 0.25][i % 4] for i in range(20)
}


def _mix_oracle() -> str:
    thr = "CASE " + " ".join(
        f"WHEN source = '{s}' THEN {int(r * curation.TWO32)}"
        for s, r in sorted(MIX_RATES.items())
    ) + " ELSE 0 END"
    u = _hex8_sql("md5(CAST(doc_id AS VARCHAR))", 1)
    b = _hex8_sql("md5(CAST(doc_id AS VARCHAR))", 9)
    return f"""
    SELECT doc_id, source,
           CASE WHEN {b} % 100 < 80 THEN 'train'
                WHEN {b} % 100 < 90 THEN 'val'
                ELSE 'test' END AS split
    FROM documents
    WHERE {u} < {thr}
    """


@query("doc_mixture_splits", oracle=_mix_oracle())
def doc_mixture_splits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic source mixing + train/val/test assignment
    (``operators/curation.py``): decisions are pure functions of the row id
    (md5 windows), so the corpus is byte-identical under retries,
    repartitioning, and incremental re-runs — ``rand()``/``sample()`` are
    not.  Pushdown-friendly stateless filter."""
    docs = load(spark, sf_dir, "documents")
    sampled = curation.mixture_sample(docs, MIX_RATES)
    return curation.assign_split(sampled).select("doc_id", "source", "split")


@query(
    "doc_token_packing",
    oracle="""
    WITH n AS (SELECT doc_id, source,
                      CASE WHEN length(trim(text)) = 0 THEN 0
                           ELSE len(string_split_regex(trim(text), '\\s+')) END
                        AS n_tokens
               FROM documents),
    c AS (SELECT doc_id, source, n_tokens,
                 sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id)
                   AS cum
          FROM n),
    p AS (SELECT doc_id, source, n_tokens,
                 CAST(floor((cum - n_tokens) / 512) AS BIGINT) AS pack_id
          FROM c)
    SELECT doc_id, source, n_tokens, pack_id,
           CAST(row_number() OVER (PARTITION BY source, pack_id
                ORDER BY doc_id) AS BIGINT) AS pack_pos
    FROM p
    """,
)
def doc_token_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing into 512-token budgets per source
    (``operators/curation.py pack_tokens``): running-sum window, pure
    integer math.  At 100 TB pack within deterministic sub-shards (extra
    group column) to bound per-task sequential state."""
    docs = text.token_count(load(spark, sf_dir, "documents"))
    return curation.pack_tokens(
        docs, budget=512, group_col="source", tokens_col="n_tokens"
    ).select("doc_id", "source", "n_tokens", "pack_id", "pack_pos")


@query(
    "events_resample_ffill",
    oracle="""
    WITH b AS (SELECT user_id, date_trunc('hour', min(ts)) AS mn, max(ts) AS mx
               FROM events GROUP BY user_id),
    g AS (SELECT user_id, unnest(generate_series(mn, mx, INTERVAL 1 HOUR))
                   AS slot
          FROM b)
    SELECT g.user_id, g.slot, e.ts AS ts_last, e.value AS value_last
    FROM g ASOF LEFT JOIN events e
      ON g.user_id = e.user_id AND g.slot >= e.ts
    """,
)
def events_resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resample + forward-fill (hypertable-style gap fill):
    each user gets an hourly slot grid spanning their activity, and every
    slot carries the most recent observation at-or-before it — the grid is
    generated with ``sequence``/explode (no shuffle beyond the per-user
    agg) and the fill is one :func:`..operators.temporal.asof_join` (one
    key shuffle).  Slots before a user's first event stay NULL."""
    ev = load_events(spark, sf_dir)
    bounds = ev.groupBy("user_id").agg(
        F.date_trunc("hour", F.min("ts")).alias("mn"),
        F.max("ts").alias("mx"),
    )
    slots = bounds.select(
        "user_id",
        F.explode(
            F.sequence(F.col("mn"), F.col("mx"), F.expr("INTERVAL 1 HOUR"))
        ).alias("slot"),
    )
    events = ev.select("user_id", "ts", "value", "event_id")
    return temporal.asof_join(
        slots,
        events,
        on="user_id",
        left_ts="slot",
        right_ts="ts",
        right_cols=["value"],
        suffix="_last",
        right_seq="event_id",
    )


@query(
    "corpus_vocab_topk",
    oracle="""
    WITH toks AS (SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\\s+'))
                    AS term
                  FROM documents),
    freq AS (SELECT term, count(*) AS tf, count(DISTINCT doc_id) AS df
             FROM toks GROUP BY term),
    ranked AS (SELECT term, tf, df,
                      CAST(row_number() OVER (ORDER BY tf DESC, term) AS INT)
                        AS rank
               FROM freq)
    SELECT term, tf, df, rank FROM ranked WHERE rank <= 50
    """,
)
def corpus_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary statistics: top-50 terms by frequency with doc
    frequency — the Zipf-curve / tokenizer-coverage audit.  Explode +
    partial-aggregated count (map-side combine collapses each partition to
    its distinct terms before the shuffle), then ``orderBy().limit(50)``
    over the |vocab|-sized aggregate, which lowers to
    ``TakeOrderedAndProject`` — per-partition heaps of 50 rows merged on
    the driver, so at web-corpus scale the 10⁷-10⁹-term vocabulary never
    funnels through one partition (an unpartitioned rank window would).
    Rank is then derived from the 50-row result with a single-row
    ``array_sort`` + ``posexplode`` — no Window node anywhere in the plan."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(text.tokens("text")).alias("term")
    )
    freq = toks.groupBy("term").agg(
        F.count("*").alias("tf"), F.count_distinct("doc_id").alias("df")
    )
    top = freq.orderBy(F.col("tf").desc(), "term").limit(50)
    # (-tf, term) ascending == (tf desc, term asc); integer negation is exact.
    packed = top.agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    (-F.col("tf")).alias("__neg_tf"),
                    F.col("term").alias("term"),
                    F.col("df").alias("df"),
                )
            )
        ).alias("__a")
    )
    return packed.select(F.posexplode("__a").alias("__pos", "__s")).select(
        F.col("__s.term").alias("term"),
        (-F.col("__s.__neg_tf")).alias("tf"),
        F.col("__s.df").alias("df"),
        (F.col("__pos") + 1).cast("int").alias("rank"),
    )


@query(
    "events_daily_rolling",
    oracle="""
    WITH d AS (SELECT date_trunc('day', ts) AS day,
                      count(*) AS n_events,
                      count(DISTINCT user_id) AS dau,
                      sum(CAST(value AS DECIMAL(18,2))) AS sumv
               FROM events GROUP BY day)
    SELECT day, n_events, dau,
           CAST(sumv AS DOUBLE) AS day_value,
           CAST(sum(n_events) OVER (ORDER BY day
               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT)
             AS events_7d,
           CAST(sum(sumv) OVER (ORDER BY day
               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS value_7d
    FROM d
    """,
)
def events_daily_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily activity rollup + 7-day rolling window (classic engagement
    dashboard): the heavy pass is one partial-aggregated groupBy to ~days
    rows; the rolling frame then runs over that tiny aggregate (single
    task is fine — it is O(days), not O(events)).  Money math in decimal."""
    from pyspark.sql import Window

    ev = load_events(spark, sf_dir)
    d = ev.groupBy(
        F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(
        F.count("*").alias("n_events"),
        F.count_distinct("user_id").alias("dau"),
        F.sum(F.col("value").cast("decimal(18,2)")).alias("sumv"),
    )
    w = Window.orderBy("day").rowsBetween(-6, 0)
    return d.select(
        "day",
        "n_events",
        "dau",
        F.col("sumv").cast("double").alias("day_value"),
        F.sum("n_events").over(w).alias("events_7d"),
        F.sum("sumv").over(w).cast("double").alias("value_7d"),
    )


@query(
    "doc_benchmark_decontamination",
    oracle=r"""
    WITH ct AS (SELECT doc_id,
                       string_split_regex(trim(lower(text)), '\s+') AS t
                FROM documents),
    sh AS (SELECT doc_id,
                  list_distinct(list_transform(
                    range(1, greatest(len(t) - 6, 1) + 1),
                    i -> array_to_string(t[i:i+6], ' '))) AS g
           FROM ct),
    bg AS (SELECT DISTINCT unnest(g) AS gram FROM sh WHERE doc_id % 50 = 0),
    cg AS (SELECT doc_id, unnest(g) AS gram FROM sh),
    hits AS (SELECT cg.doc_id, count(*) AS n_contaminated_grams
             FROM cg JOIN bg USING (gram) GROUP BY 1)
    SELECT s.doc_id,
           len(s.g) AS n_grams,
           coalesce(h.n_contaminated_grams, 0) AS n_contaminated_grams,
           coalesce(h.n_contaminated_grams, 0) > 0 AS contaminated
    FROM sh s LEFT JOIN hits h USING (doc_id)
    """,
)
def doc_benchmark_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval overlap detection (``curation.decontaminate_flags``):
    every 50th document stands in for a benchmark set; corpus docs sharing
    any word 7-gram with it are flagged (7 instead of the published 13
    because the synthetic docs are short — the operator default stays 13).
    The benchmark gram set broadcasts; the corpus is scanned once and only
    the per-doc hit count shuffles.  Oracle mirrors the shingle definition
    (distinct grams, short docs one shingle) in DuckDB list functions."""
    docs = load(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 50 == 0)
    return curation.decontaminate_flags(docs, bench, n=7)


@query(
    "doc_gopher_quality",
    oracle=r"""
    WITH ct AS (
      SELECT doc_id, text, string_split_regex(trim(lower(text)), '\s+') AS t
      FROM documents),
    m AS (
      SELECT doc_id,
             len(t) AS n_words,
             list_reduce(list_prepend(0.0::DOUBLE,
                list_transform(t, x -> length(x)::DOUBLE)), (a,b) -> a + b)
               / len(t) AS mean_wl,
             (length(text) - length(replace(text, '#', ''))
              + (length(text) - length(replace(text, '...', ''))) / 3)::DOUBLE
               / len(t) AS symbol_ratio,
             len(list_filter(string_split(text, chr(10)),
                 l -> regexp_matches(trim(l), '^[-*•]')))::DOUBLE
               / len(string_split(text, chr(10))) AS bullet_ratio,
             len(list_filter(string_split(text, chr(10)),
                 l -> regexp_matches(trim(l), '\.\.\.$')))::DOUBLE
               / len(string_split(text, chr(10))) AS ellipsis_ratio,
             len(list_filter(t, x -> regexp_matches(x, '[a-z]')))::DOUBLE
               / len(t) AS alpha_ratio,
             len(list_intersect(list_distinct(t),
                 ['join','hash','row','batch','scan','column','filter',
                  'table'])) AS n_req
      FROM ct)
    SELECT doc_id,
           n_words >= 30 AND n_words <= 100000 AS ok_word_count,
           mean_wl >= 3.0 AND mean_wl <= 10.0 AS ok_mean_word_len,
           symbol_ratio <= 0.1 AS ok_symbol_ratio,
           bullet_ratio <= 0.9 AS ok_bullet_lines,
           ellipsis_ratio <= 0.3 AS ok_ellipsis_lines,
           alpha_ratio >= 0.8 AS ok_alpha_words,
           n_req >= 2 AS ok_required_words,
           (n_words >= 30 AND n_words <= 100000)
            AND (mean_wl >= 3.0 AND mean_wl <= 10.0)
            AND symbol_ratio <= 0.1 AND bullet_ratio <= 0.9
            AND ellipsis_ratio <= 0.3 AND alpha_ratio >= 0.8
            AND n_req >= 2 AS gopher_pass
    FROM m
    """,
)
def doc_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Gopher/MassiveWeb quality rules (Rae et al. 2021, appendix A —
    ``curation.gopher_quality_flags``) over the documents table: one
    boolean per rule + the conjunction, one scan, no shuffle.  The
    registered run lowers ``min_words`` to 30 and supplies corpus-domain
    required words (the synthetic docs are short Spark-vocabulary text
    with no English function words — the operator defaults stay the
    paper's); the oracle replays every ratio with the same explicit
    double arithmetic."""
    return curation.gopher_quality_flags(
        load(spark, sf_dir, "documents"),
        min_words=30,
        required_words=(
            "join", "hash", "row", "batch", "scan", "column", "filter",
            "table",
        ),
    )


@query(
    "doc_source_caps",
    oracle=f"""
    SELECT doc_id, source FROM (
      SELECT doc_id, source,
             row_number() OVER (
               PARTITION BY source
               ORDER BY {_hex8_sql("md5(CAST(doc_id AS VARCHAR))", 1)}, doc_id
             ) AS rn
      FROM documents) WHERE rn <= 10
    """,
)
def doc_source_caps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document cap (``curation.cap_per_group``): no source may
    contribute more than 10 documents — the domain rate-limiting control
    of C4/MassiveWeb-style pipelines.  Selection is hash-ranked (smallest
    md5(id) first), so survivors are a deterministic uniform subsample of
    each source; the engine runs it through the two-phase grouped_topk
    k-heap (exchange carries ≤ partitions × sources × cap id rows), while
    the oracle uses the equivalent full row_number window — identical
    survivor sets, different physical cost."""
    docs = load(spark, sf_dir, "documents")
    return curation.cap_per_group(docs, cap=10).select("doc_id", "source")


# ---------------------------------------------------------------------------
# Classifier-based filtering (fastText-shape hashed linear model)
# ---------------------------------------------------------------------------

#: Deterministic stand-in weight table (B = 256 buckets).  A production
#: pipeline loads trained weights; the lane's value is the feature-hash /
#: lookup / fold plumbing, which is weight-agnostic.  Weights are
#: k/128 (dyadic rationals) so the inlined literals parse to EXACTLY the
#: same double in both engines — DuckDB parses float literals through
#: DECIMAL, and its decimal→double conversion can land one ulp off the
#: correctly-rounded parse for deep-precision reprs.
_CLF_WEIGHTS = [((b * 37 + 11) % 97 - 48) / 128.0 for b in range(256)]


def _clf_oracle() -> str:
    wl = "[" + ",".join(repr(w) for w in _CLF_WEIGHTS) + "]::DOUBLE[]"
    b = len(_CLF_WEIGHTS)

    def grams(k: int) -> str:
        return (
            f"list_transform(range(1, greatest(len(t) - {k}, 0) + 1 + 1), "
            f"i -> array_to_string(t[i:i+{k - 1}], ' '))"
        )

    poly = (
        "s -> list_reduce(list_prepend(0::BIGINT, "
        "list_transform(range(1, len(s) + 1), j -> ord(s[j])::BIGINT)), "
        "(acc, c) -> (acc * 257 + c) % 2147483647)"
    )
    return rf"""
    WITH ct AS (
      SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t
      FROM documents),
    feats AS (
      SELECT doc_id,
             list_concat(list_transform({grams(1)}, {poly}),
                         list_transform({grams(2)}, {poly})) AS h
      FROM ct),
    scored AS (
      SELECT doc_id, len(h) AS n_features,
             list_reduce(list_prepend(0.0::DOUBLE,
               list_transform(h, x -> ({wl})[(x % {b})::INT + 1])),
               (a, v) -> a + v) / len(h) AS clf_score
      FROM feats)
    SELECT doc_id, CAST(n_features AS BIGINT) AS n_features, clf_score,
           clf_score >= 0.0 AS keep
    FROM scored
    """


@query("doc_quality_classifier", oracle=_clf_oracle())
def doc_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier-based filtering (``operators/curation.py
    hashed_classifier_score``): fastText-shape hashed linear model —
    unigram+bigram polynomial feature hashes into a 256-bucket weight
    table inlined as a plan literal, ordered-fold mean score, keep flag at
    0.  One Catalyst projection: no vocabulary join, no shuffle, no UDF —
    the exact shape a trained CCNet/DCLM-style filter runs at 100 TB."""
    docs = load(spark, sf_dir, "documents")
    out = curation.hashed_classifier_score(docs, _CLF_WEIGHTS, threshold=0.0)
    return out.select("doc_id", "n_features", "clf_score", "keep")


# ---------------------------------------------------------------------------
# Bigram-LM fluency (perplexity-filter shape, log-free)
# ---------------------------------------------------------------------------

@query(
    "doc_lm_fluency",
    oracle=rf"""
    WITH ct AS (
      SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t
      FROM documents),
    bi AS (
      SELECT doc_id, i AS pos, t[i] AS prev, t[i + 1] AS w
      FROM (SELECT doc_id, t,
                   unnest(range(1, greatest(len(t) - 1, 0) + 1)) AS i
            FROM ct)),
    c2 AS (SELECT prev, w, count(*) AS c2 FROM bi GROUP BY 1, 2),
    c1 AS (SELECT prev, sum(c2) AS c1 FROM c2 GROUP BY 1),
    v AS (SELECT count(DISTINCT tok) AS vs
          FROM (SELECT unnest(t) AS tok FROM ct)),
    p AS (SELECT bi.doc_id, bi.pos,
                 (c2.c2 + 1.0::DOUBLE) / (c1.c1 + 1.0::DOUBLE * vs) AS pr
          FROM bi JOIN c2 USING (prev, w) JOIN c1 USING (prev) CROSS JOIN v),
    agg AS (SELECT doc_id, count(*) AS n_bigrams,
                   list_reduce(list_prepend(0.0::DOUBLE,
                     list(pr ORDER BY pos)), (a, x) -> a + x) AS s
            FROM p GROUP BY doc_id)
    SELECT d.doc_id,
           CAST(coalesce(a.n_bigrams, 0) AS BIGINT) AS n_bigrams,
           a.s / a.n_bigrams AS lm_score
    FROM documents d LEFT JOIN agg a USING (doc_id)
    """,
)
def doc_lm_fluency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-trained bigram-LM fluency scores (``operators/curation.py
    ngram_lm_fluency``): add-one-smoothed conditionals from the corpus's
    own bigram counts, per-doc mean conditional probability folded in
    position order.  The log-free reformulation of the CCNet perplexity
    filter — count ratios and ordered sums are exact IEEE ops, ``ln``
    is not (libm)."""
    docs = load(spark, sf_dir, "documents")
    return curation.ngram_lm_fluency(docs).select(
        "doc_id", "n_bigrams", "lm_score"
    )


@query(
    "events_cohort_retention",
    oracle="""
    WITH first AS (
      SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
      FROM events GROUP BY user_id),
    act AS (
      SELECT DISTINCT user_id, date_trunc('week', ts) AS week FROM events),
    sizes AS (
      SELECT cohort_week, count(*) AS cohort_size
      FROM first GROUP BY cohort_week)
    SELECT f.cohort_week,
           CAST((epoch(a.week) - epoch(f.cohort_week)) / 604800 AS INT)
             AS week_offset,
           count(DISTINCT a.user_id) AS n_active,
           min(s.cohort_size) AS cohort_size
    FROM first f
    JOIN act a USING (user_id)
    JOIN sizes s ON s.cohort_week = f.cohort_week
    GROUP BY f.cohort_week, week_offset
    """,
)
def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix (classic growth analytics): users cohorted
    by first-activity week, activity counted per (cohort, week-offset).
    Two partial-aggregated passes — first-touch per user, distinct
    (user, week) activity — then a skinny join on user_id; both sides
    shuffle once on the same key.  Week arithmetic stays integral
    (week-truncated timestamps differ by exact multiples of 7 days), so
    the offset is bit-stable in any engine.
    """
    ev = load_events(spark, sf_dir)
    first = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    act = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("week")
    ).distinct()
    sizes = first.groupBy("cohort_week").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    return (
        first.join(act, "user_id")
        .join(sizes, "cohort_week")
        .groupBy(
            "cohort_week",
            (F.datediff(F.col("week"), F.col("cohort_week")) / 7)
            .cast("int").alias("week_offset"),
        )
        .agg(
            F.count_distinct("user_id").alias("n_active"),
            F.min("cohort_size").alias("cohort_size"),
        )
    )


@query(
    "events_funnel_stages",
    oracle="""
    WITH v AS (SELECT user_id, min(ts) AS vts
               FROM events WHERE event_type = 'view' GROUP BY user_id),
    c AS (SELECT v.user_id, min(e.ts) AS cts
          FROM v JOIN events e
            ON e.user_id = v.user_id AND e.event_type = 'click'
           AND e.ts > v.vts
          GROUP BY v.user_id),
    p AS (SELECT c.user_id, min(e.ts) AS pts
          FROM c JOIN events e
            ON e.user_id = c.user_id AND e.event_type = 'purchase'
           AND e.ts > c.cts
          GROUP BY c.user_id)
    SELECT v.user_id,
           CASE WHEN p.user_id IS NOT NULL THEN 3
                WHEN c.user_id IS NOT NULL THEN 2
                ELSE 1 END AS funnel_stage
    FROM v
    LEFT JOIN c ON c.user_id = v.user_id
    LEFT JOIN p ON p.user_id = v.user_id
    """,
)
def events_funnel_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel (view → later click → later purchase) per user —
    the event-sequence analytics shape sessionization doesn't cover:
    each stage anchors on the PREVIOUS stage's first-occurrence time, so
    out-of-order events (a purchase before any view) do not convert.
    Three first-touch aggregations, each shuffling on user_id only; the
    stage joins are skinny (one row per user).
    """
    ev = load_events(spark, sf_dir)
    v = ev.where(F.col("event_type") == "view").groupBy("user_id").agg(
        F.min("ts").alias("vts")
    )
    c = (
        v.join(
            ev.where(F.col("event_type") == "click").select(
                "user_id", F.col("ts").alias("__cts")
            ),
            "user_id",
        )
        .where(F.col("__cts") > F.col("vts"))
        .groupBy("user_id")
        .agg(F.min("__cts").alias("cts"))
    )
    p = (
        c.join(
            ev.where(F.col("event_type") == "purchase").select(
                "user_id", F.col("ts").alias("__pts")
            ),
            "user_id",
        )
        .where(F.col("__pts") > F.col("cts"))
        .groupBy("user_id")
        .agg(F.min("__pts").alias("pts"))
    )
    return (
        v.join(c.select("user_id", F.lit(2).alias("__c")), "user_id", "left")
        .join(p.select("user_id", F.lit(3).alias("__p")), "user_id", "left")
        .select(
            "user_id",
            F.coalesce("__p", "__c", F.lit(1)).cast("int").alias("funnel_stage"),
        )
    )


@query(
    "events_hourly_ohlc",
    oracle="""
    WITH h AS (
      SELECT date_trunc('hour', ts) AS hour, value,
             row_number() OVER (PARTITION BY date_trunc('hour', ts)
                  ORDER BY ts, event_id) AS rna,
             row_number() OVER (PARTITION BY date_trunc('hour', ts)
                  ORDER BY ts DESC, event_id DESC) AS rnd
      FROM events)
    SELECT hour,
           max(CASE WHEN rna = 1 THEN value END) AS open,
           max(value) AS high,
           min(value) AS low,
           max(CASE WHEN rnd = 1 THEN value END) AS close,
           count(*) AS n_events
    FROM h GROUP BY hour
    """,
)
def events_hourly_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC (open/high/low/close) hourly resampling — the time-series
    candlestick shape: first/last anchored on (ts, event_id) so
    same-microsecond ties break deterministically in any engine.  Two
    window passes + one aggregation, all partitioned by the hour bucket;
    values pass through untouched (no float arithmetic to diverge).
    """
    from pyspark.sql import Window

    ev = load_events(spark, sf_dir).withColumn(
        "hour", F.date_trunc("hour", F.col("ts"))
    )
    wa = Window.partitionBy("hour").orderBy("ts", "event_id")
    wd = Window.partitionBy("hour").orderBy(F.desc("ts"), F.desc("event_id"))
    h = ev.withColumn("rna", F.row_number().over(wa)).withColumn(
        "rnd", F.row_number().over(wd)
    )
    return h.groupBy("hour").agg(
        F.max(F.when(F.col("rna") == 1, F.col("value"))).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max(F.when(F.col("rnd") == 1, F.col("value"))).alias("close"),
        F.count(F.lit(1)).alias("n_events"),
    )


def _temperature_ctes(src: str) -> str:
    """τ=0.5 rate CTEs over any relation ``src(doc_id, source, ...)`` —
    shared by the standalone mixture lane and the end-to-end curation
    pipeline (counts → fixed-point √n weights → capped rates →
    uint32 thresholds, every float step correctly rounded)."""
    return f"""counts AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(floor(sqrt(CAST(COUNT(*) AS DOUBLE)) * 1048576.0)
                  AS BIGINT) AS w
      FROM {src} GROUP BY source),
    tot AS (
      SELECT CAST(SUM(n) AS BIGINT) AS N, CAST(SUM(w) AS BIGINT) AS W,
             CAST(floor(0.5::DOUBLE * CAST(SUM(n) AS DOUBLE)) AS BIGINT)
               AS target
      FROM counts),
    rates AS (
      SELECT c.source, c.n,
             least(1.0::DOUBLE,
                   (CAST(t.target AS DOUBLE) * CAST(c.w AS DOUBLE))
                     / (CAST(t.W AS DOUBLE) * CAST(c.n AS DOUBLE))) AS rate
      FROM counts c CROSS JOIN tot t),
    thr AS (SELECT source, n, rate,
                   CAST(floor(rate * 4294967296.0) AS BIGINT) AS thrv
            FROM rates)"""


@query(
    "doc_temperature_mixture",
    oracle=f"""
    WITH {_temperature_ctes("documents")}
    SELECT d.doc_id, d.source, r.n AS n_source, r.rate
    FROM documents d JOIN thr r USING (source)
    WHERE {_hex8_sql("md5(CAST(doc_id AS VARCHAR))", 1)} < r.thrv
    """,
)
def doc_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """τ=0.5 temperature-sampled corpus mixture
    (``operators/curation.py temperature_mixture``): per-source keep
    rates derived FROM the corpus counts (∝ √n_s, normalized to a 50%
    global budget, capped at 1.0) — the XLM-R/mT5 mixing rule that
    flattens dominant sources and upweights rare ones — then the same
    deterministic md5-window keep rule as ``doc_mixture_splits``.
    τ is pinned to 0.5 so every float step is correctly rounded
    (sqrt/mul/div over exact fixed-point integers); the oracle replays
    counts, weights, rates, thresholds, and the hash gate bit-for-bit."""
    docs = load(spark, sf_dir, "documents")
    return curation.temperature_mixture(docs, target_frac=0.5).select(
        "doc_id", "source", "n_source", "rate"
    )


#: Shared by the batch sweep and its stateful-streaming twin — under
#: per-key arrival order (time-split landing files) the stream's emitted
#: set is exactly the batch window replay.
_ROLLING_ANOMALY_ORACLE = """
    WITH base AS (
      SELECT event_id, event_type, value,
             CAST(floor(value * 1000.0) AS BIGINT) AS v,
             COUNT(*) OVER w AS n,
             SUM(CAST(floor(value * 1000.0) AS BIGINT)) OVER w AS s1,
             SUM(CAST(floor(value * 1000.0) AS BIGINT)
                 * CAST(floor(value * 1000.0) AS BIGINT)) OVER w AS s2
      FROM events
      WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
                   ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING))
    SELECT event_id, event_type, value,
           CAST(n AS BIGINT) AS n_window,
           CAST((n * v - s1) * (n * v - s1) AS BIGINT) AS dev_sq,
           CAST(n * s2 - s1 * s1 AS BIGINT) AS var_term
    FROM base
    WHERE n >= 8
      AND (n * v - s1) * (n * v - s1) * (n - 1) > 9 * n * (n * s2 - s1 * s1)
    """


@query("events_rolling_anomaly", oracle=_ROLLING_ANOMALY_ORACLE)
def events_rolling_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly detection
    (``operators/temporal.py rolling_anomaly``): flag events >3 sample
    standard deviations from their type's previous-20-row baseline
    (current row excluded so an outlier cannot mask itself).  The
    z-test is a cross-multiplied INTEGER inequality over fixed-point
    window sums — no division/sqrt/float accumulation, so the flag is
    bit-identical in any engine.  One shuffle by event_type."""
    events = load_events(spark, sf_dir)
    return temporal.rolling_anomaly(events)


@query(
    "doc_curation_pipeline",
    oracle=f"""
    WITH tok AS (
      SELECT *, CASE WHEN length(trim(text)) = 0 THEN 0
                     ELSE len(string_split_regex(trim(text), '\\s+')) END
                  AS n_tokens
      FROM documents),
    kept AS (SELECT * FROM tok WHERE n_tokens >= 25),
    fp AS (
      SELECT *, sha256(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS f
      FROM kept),
    dd AS (
      SELECT fp.* FROM fp
      JOIN (SELECT f, min(doc_id) AS doc_id FROM fp GROUP BY f) k
        USING (f, doc_id)),
    {_temperature_ctes("dd")}
    SELECT d.doc_id, d.source, r.n AS n_source, r.rate,
           CASE WHEN {_hex8_sql("md5(CAST(doc_id AS VARCHAR))", 9)} % 100 < 80
                  THEN 'train'
                WHEN {_hex8_sql("md5(CAST(doc_id AS VARCHAR))", 9)} % 100 < 90
                  THEN 'val'
                ELSE 'test' END AS split
    FROM dd d JOIN thr r USING (source)
    WHERE {_hex8_sql("md5(CAST(doc_id AS VARCHAR))", 1)} < r.thrv
    """,
)
def doc_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation operators COMPOSED end-to-end — the pipeline a
    training-data team actually runs, as one lane: (1) quality gate
    (≥25 whitespace tokens — drops the short tail), (2) exact dedup on the normalized-content
    sha256 (min-id winner), (3) τ=0.5 temperature mixture with rates
    derived from the SURVIVING corpus (composition matters: dedup
    changes the per-source counts the rates come from), (4)
    deterministic train/val/test assignment from a disjoint hash
    window.  Every stage is a pure function of the row or of exact
    integer aggregates, so the whole four-stage pipeline hash-matches
    the chained SQL replay.  Scale: stages 1-2 are one scan + one hash
    shuffle; stage 3 adds a count agg + broadcast join; stage 4 is
    stateless — nothing quadratic, nothing driver-side."""
    docs = load(spark, sf_dir, "documents")
    n_tokens = F.when(
        F.length(F.trim(F.col("text"))) == 0, F.lit(0)
    ).otherwise(F.size(F.split(F.trim(F.col("text")), r"\s+")))
    kept = docs.withColumn("__nt", n_tokens).filter(F.col("__nt") >= 25)
    # materialize the dedup stage once (lazy checkpoint): the mixture's
    # rate aggregate AND the final output both consume it — left lazy,
    # the gate+dedup subtree re-executes per consumer (each curation
    # stage materializes its output in a real pipeline too)
    deduped = dedup_ops.exact_dedup(kept).localCheckpoint(eager=False)
    mixed = curation.temperature_mixture(deduped, target_frac=0.5)
    return curation.assign_split(mixed).select(
        "doc_id", "source", "n_source", "rate", "split"
    )


@query("events_stream_anomaly_ingest", oracle=_ROLLING_ANOMALY_ORACLE)
def events_stream_anomaly_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """On-arrival anomaly alerting (``streaming/stateful.py
    rolling_anomaly_stream``): the per-key last-20 baseline rides the
    STATE STORE across micro-batches — the landing zone is split into
    two time-ordered files (ties kept in the first; explicit mtimes pin
    the ``maxFilesPerTrigger=1`` batch order), so every key's window
    genuinely spans the batch boundary and a spike in batch 2 is judged
    against history from batch 1.  Under per-key arrival order the
    emitted set equals the batch sweep exactly, so the stream shares
    ``events_rolling_anomaly``'s full window-replay oracle.  State is
    ≤20 bigints per key; rows emit on arrival, no watermark needed."""
    import os
    import tempfile

    from .streaming import stateful

    work = tempfile.mkdtemp(prefix="medallion_anom_")
    landing = os.path.join(work, "landing")
    os.makedirs(landing)
    ev = load_events(spark, sf_dir).select("event_id", "ts", "event_type", "value")
    # any time-ordered split point yields the same emitted set (the
    # oracle replays the FULL window sweep; ties stay in the first
    # file for any mid) — so the approximate median, a partial-agg
    # sketch, replaces the exact percentile's per-group sort (r14,
    # VERDICT r13 "what's wrong" #3 follow-up)
    mid = ev.selectExpr(
        "percentile_approx(unix_micros(ts), 0.5, 1000) AS m"
    ).first()["m"]
    early = ev.filter(F.unix_micros("ts") <= mid)
    late = ev.filter(F.unix_micros("ts") > mid)
    for i, part in enumerate((early, late)):
        d = os.path.join(work, f"stage{i}")
        part.coalesce(1).write.parquet(d)
        for f in os.listdir(d):
            if f.endswith(".parquet"):
                dst = os.path.join(landing, f"b{i}_{f}")
                os.rename(os.path.join(d, f), dst)
                os.utime(dst, (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(landing)
    )
    res = stateful.rolling_anomaly_stream(stream)
    return stateful.run_to_memory(
        spark, res, os.path.join(work, "ckpt"), state_partitions=8
    )


#: Plan budget for the epochs lane: 2× the corpus so head sources need
#: >1 epoch and √-upweighted rare sources hit the repetition cap.
_EPOCH_BUDGET_MULT = 2


@query(
    "doc_token_budget_epochs",
    oracle="""
    WITH n AS (
      SELECT source,
             CASE WHEN length(trim(text)) = 0 THEN 0
                  ELSE len(string_split_regex(trim(text), '\\s+')) END AS nt
      FROM documents),
    t AS (SELECT source, CAST(SUM(nt) AS BIGINT) AS corpus_tokens,
                 CAST(floor(sqrt(CAST(SUM(nt) AS DOUBLE)) * 1048576.0)
                      AS BIGINT) AS w
          FROM n GROUP BY source),
    tot AS (SELECT CAST(SUM(corpus_tokens) AS BIGINT) AS B0,
                   CAST(SUM(w) AS BIGINT) AS W FROM t),
    plan AS (
      SELECT t.source, t.corpus_tokens,
             (2 * tot.B0 * t.w) // tot.W AS target_tokens
      FROM t CROSS JOIN tot)
    SELECT source, corpus_tokens, target_tokens,
           (1000 * target_tokens) // corpus_tokens AS epochs_milli,
           least(target_tokens, corpus_tokens * 4) AS effective_tokens,
           target_tokens > corpus_tokens * 4 AS repetition_limited
    FROM plan
    """,
)
def doc_token_budget_epochs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mix plan (``operators/curation.py token_budget_epochs``):
    per-source epoch allocation for a budget of 2× the corpus's own
    tokens under τ=0.5 weights — √-upweighted rare sources overshoot
    their size and hit the 4-epoch repetition cap (flagged), head
    sources run just over 1 epoch.  All-integer math (token sums,
    fixed-point weights, floor divisions) so the PLAN itself is
    hash-verified; one aggregate + a 1-row collect, no data pass."""
    docs = load(spark, sf_dir, "documents")
    nt = F.when(F.length(F.trim(F.col("text"))) == 0, F.lit(0)).otherwise(
        F.size(F.split(F.trim(F.col("text")), r"\s+"))
    )
    with_nt = docs.withColumn("n_tokens", nt.cast("long"))
    total = int(with_nt.agg(F.sum("n_tokens").alias("t")).first()["t"])
    return curation.token_budget_epochs(
        with_nt, budget_tokens=_EPOCH_BUDGET_MULT * total, max_epochs=4
    )
