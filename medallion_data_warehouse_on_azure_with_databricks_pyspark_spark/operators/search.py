"""Sparse keyword retrieval: distributed BM25 scoring + per-query top-k.

Extension surface for training-data curation (no reference counterpart):
keyword search over the ``documents`` corpus is the standard tool for
targeted quality audits ("show me the docs matching these terms") and for
sourcing seed sets for classifier-based filtering.

Spark-first plan — the corpus is touched exactly once and **nothing about
the corpus is ever shuffled**:

1. per-doc index: ONE pass over the text column computes doc length and
   the tf of every query-vocabulary term via higher-order array filters —
   the token stream is never exploded, never shuffled.  The index frame
   (O(docs) skinny rows) is ``localCheckpoint``-ed: this is the "build the
   postings index once" step (at warehouse scale you would persist it as a
   table and share it across query batches).
2. index metadata: corpus size N, average doc length, and per-term df are
   two tiny aggregates of the index frame, collected driver-side and
   compiled into the scoring expressions as literals — the same role as an
   index header in a search engine.  Bounded by |vocabulary|, not corpus.
3. scoring: every query's BM25 total is a closed-form column over the
   per-doc tf array, so ALL queries score in a single map-side projection
   (posexplode over the per-query score array).  Zero-hit (query, doc)
   pairs are dropped by a strict ``score > 0`` filter (the rational idf is
   always positive, so score > 0 ⇔ some query term matched).
4. per-query top-k via the two-phase partial top-k
   (:func:`..similarity.grouped_topk`) — the only exchange in the whole
   plan, carrying partitions×queries×k candidate rows.

Determinism: scores accumulate in sorted-term order as a left-assoc chain
seeded at 0.0 — identical to the oracle's ordered fold (absent terms
contribute exactly +0.0, which is an exact float identity).  ``idf`` uses
the *log-free rational form* ``(N − df + 0.5) / (df + 0.5)`` instead of the
textbook ``ln(1 + …)``: order-equivalent (ln is monotone) so rankings are
identical, but free of libm last-ulp variance across engines.  Pass
``log_idf=True`` for textbook scoring when cross-engine bit-exactness is
not required.
"""

from __future__ import annotations

import math
from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .similarity import grouped_topk
from .text import tokens

K1 = 1.2
B = 0.75


def query_terms_df(spark: SparkSession, queries: dict[int, list[str]]) -> DataFrame:
    """Literal (query_id, term) frame from an inline query set (terms are
    lowercased; duplicates within a query dropped — BM25 scores distinct
    terms)."""
    rows = sorted(
        {(qid, t.lower()) for qid, terms in queries.items() for t in terms}
    )
    return spark.createDataFrame(rows, "query_id int, term string")


def bm25_topk(
    docs: DataFrame,
    query_terms: DataFrame,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = K1,
    b: float = B,
    log_idf: bool = False,
) -> DataFrame:
    """Per-query BM25 top-k: ``(query_id, doc_id, bm25, rank)``.

    ``query_terms`` is a (query_id, term) relation — tiny by construction
    (it is the user's query set), so it is collected driver-side and
    compiled into the plan; see the module docstring for the stage shape.
    """
    qrows = query_terms.select("query_id", "term").distinct().collect()
    query_sets: dict[int, set[str]] = {}
    for r in qrows:
        query_sets.setdefault(r["query_id"], set()).add(r["term"])
    vocab = sorted({t for ts in query_sets.values() for t in ts})
    slot = {t: i for i, t in enumerate(vocab)}

    toks = tokens(text_col)
    tf_arr = F.array(
        *[F.size(F.filter(toks, lambda x: x == F.lit(t))) for t in vocab]
    )
    dl = F.when(F.length(F.trim(F.col(text_col))) == 0, F.lit(0)).otherwise(
        F.size(toks)
    )
    # Spread the narrow (id, text) projection to the core count before the
    # CPU-heavy per-vocab tf pass — a small single-file scan would pin the
    # whole indexing stage (and the checkpoint that caches it) to one core.
    from .dedup import parallelize_narrow_input

    narrow = parallelize_narrow_input(docs.select(F.col(id_col), F.col(text_col)))
    per_doc = narrow.select(
        F.col(id_col), dl.alias("dl"), tf_arr.alias("__tf")
    ).localCheckpoint()

    # index metadata (two jobs over the checkpointed index, driver-inlined)
    n_docs, sum_dl = per_doc.agg(F.count("*"), F.sum("dl")).first()
    avgdl = float(sum_dl) / n_docs if n_docs else 1.0
    df_row = per_doc.agg(
        *[
            F.sum((F.col("__tf")[slot[t]] > 0).cast("long")).alias(t)
            for t in vocab
        ]
    ).first()
    idf = {}
    for t in vocab:
        df_t = df_row[t] or 0
        idf[t] = (n_docs - df_t + 0.5) / (df_t + 0.5)
        if log_idf:
            idf[t] = math.log1p(idf[t])

    def score_for(terms: set[str]):
        cols = []
        for t in sorted(terms):  # sorted-term fold order = oracle order
            tf = F.col("__tf")[slot[t]]
            denom = tf + k1 * (1.0 - b + b * F.col("dl") / avgdl)
            cols.append(F.lit(idf[t]) * (tf * (k1 + 1.0)) / denom)
        return reduce(lambda a, c: a + c, cols, F.lit(0.0))

    qids = sorted(query_sets)
    scores = F.array(*[score_for(query_sets[q]) for q in qids])
    qid_arr = F.array(*[F.lit(q) for q in qids])
    scored = (
        per_doc.select(
            F.col(id_col), F.posexplode(scores).alias("__pos", "bm25")
        )
        .withColumn("query_id", F.element_at(qid_arr, F.col("__pos") + 1))
        .filter(F.col("bm25") > 0)  # rational idf > 0 ⇒ hit ⇔ score > 0
        .select("query_id", id_col, "bm25")
    )
    return grouped_topk(scored, "query_id", id_col, k, score_col="bm25")


def rrf_fuse(
    rankings: list[DataFrame],
    k: int = 10,
    rrf_k: int = 60,
    query_col: str = "query_id",
    id_col: str = "doc_id",
    rank_col: str = "rank",
    out: str = "rrf",
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack & Clarke, SIGIR 2009) of N per-query
    rank lists: ``score(doc) = Σ_lanes 1 / (rrf_k + rank_lane(doc))``.

    The standard hybrid-retrieval combiner (sparse BM25 + dense ANN): rank
    lists live on incomparable score scales, so fusion uses only the ranks.
    ``rrf_k = 60`` is the paper's constant.

    Scale shape: the inputs are top-k lists — queries × k rows per lane,
    microscopic next to the corpora that produced them — so the union +
    one grouped aggregate here is never the bottleneck; the heavy lifting
    stays inside the lane operators (:func:`bm25_topk`,
    ``similarity.*_topk``), each already scale-shaped on its own.

    Determinism: per-lane contributions fold in lane order (array_sort on
    a ``(lane, contrib)`` struct, left-assoc sum seeded 0.0), so N-lane
    double addition has a fixed association both engines replay; a doc
    absent from a lane contributes exactly ``+0.0``.  Final order is
    (fused score desc, id asc) through the two-phase
    :func:`..similarity.grouped_topk`.
    """
    if not rankings:
        raise ValueError("rrf_fuse needs at least one rank list")
    tagged = None
    for lane, df in enumerate(rankings):
        part = df.select(
            F.col(query_col),
            F.col(id_col),
            F.lit(lane).alias("__lane"),
            (
                F.lit(1.0)
                / (F.lit(float(rrf_k)) + F.col(rank_col).cast("double"))
            ).alias("__contrib"),
        )
        tagged = part if tagged is None else tagged.unionByName(part)
    fused = tagged.groupBy(query_col, id_col).agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("__lane", "__contrib"))),
            F.lit(0.0),
            lambda acc, e: acc + e["__contrib"],
        ).alias(out)
    )
    return grouped_topk(fused, query_col, id_col, k, score_col=out)
