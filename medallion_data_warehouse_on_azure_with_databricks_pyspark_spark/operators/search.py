"""Sparse keyword retrieval: distributed BM25 scoring + per-query top-k.

Extension surface for training-data curation (no reference counterpart):
keyword search over the ``documents`` corpus is the standard tool for
targeted quality audits ("show me the docs matching these terms") and for
sourcing seed sets for classifier-based filtering.

Spark-first plan, built so every stage is a pruned equi-join or partial
aggregate:

1. postings: explode docs to tokens, **filter to the query vocabulary
   first** (the only tokens that can score), then partial-aggregate term
   frequencies per (doc, term).  At 100 TB the explode never materializes
   the full token stream into a shuffle — the vocabulary filter cuts it to
   matching tokens only, and tf aggregation is map-side partial.
2. document stats: token length per doc (narrow projection), corpus size
   N and average length as a 1-row broadcast.
3. df per term over the postings (tiny: ≤ |vocab| rows), broadcast.
4. score = Σ_terms idf(term) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl)),
   summed as an **ordered fold over terms sorted by term text** so the
   float sum is bit-identical on any engine / any partitioning.
5. per-query top-k via the two-phase partial top-k
   (:func:`..similarity.grouped_topk`) — the exchange carries
   partitions×queries×k candidates, never the full scored relation.

Determinism note: ``idf`` uses the *log-free rational form*
``(N − df + 0.5) / (df + 0.5)`` instead of the textbook
``ln(1 + (N − df + 0.5)/(df + 0.5))``.  It is order-equivalent (ln is
monotone) so rankings are identical, and it keeps every score inside
exact-reproducible float arithmetic — ``ln`` is the one piece of BM25 whose
last-ulp value is libm-dependent and would break bit-exact cross-engine
verification.  Pass ``log_idf=True`` for the textbook scoring when
cross-engine bit-exactness is not required.
"""

from __future__ import annotations

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

    ``query_terms`` is a (query_id, term) relation — tiny, broadcast
    everywhere it joins.  Docs with no matching term never leave stage 1.
    """
    toks = docs.select(id_col, F.explode(tokens(text_col)).alias("term"))
    vocab = query_terms.select("term").distinct()
    postings = (
        toks.join(F.broadcast(vocab), "term")  # vocabulary filter before agg
        .groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"))
    )

    doclen = docs.select(
        id_col,
        F.when(
            F.length(F.trim(F.col(text_col))) == 0, F.lit(0)
        ).otherwise(F.size(tokens(text_col))).alias("dl"),
    )
    stats = doclen.agg(
        F.count("*").alias("n_docs"), F.sum("dl").alias("sum_dl")
    )
    df_per_term = postings.groupBy("term").agg(
        F.count_distinct(F.col(id_col)).alias("df")
    )

    idf = (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    if log_idf:
        idf = F.log1p(idf)
    scored_terms = (
        postings.join(F.broadcast(df_per_term), "term")
        .join(F.broadcast(stats))
        .join(doclen, id_col)
        .join(F.broadcast(query_terms), "term")
        .withColumn("avgdl", F.col("sum_dl").cast("double") / F.col("n_docs"))
        .withColumn("idf", idf)
        .withColumn(
            "contrib",
            F.col("idf")
            * (F.col("tf") * (k1 + 1.0))
            / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))),
        )
    )
    # ordered fold over (term asc) — float sum order is pinned
    scored = scored_terms.groupBy("query_id", id_col).agg(
        F.aggregate(
            F.array_sort(
                F.collect_list(F.struct(F.col("term"), F.col("contrib")))
            ),
            F.lit(0.0),
            lambda acc, x: acc + x["contrib"],
        ).alias("bm25")
    )
    return grouped_topk(scored, "query_id", id_col, k, score_col="bm25")
