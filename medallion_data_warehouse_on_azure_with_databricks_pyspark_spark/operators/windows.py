"""Window-function operators (SURVEY.md §2.5).

Parity target: the reference's ``class windows`` wrapper applying
``dense_rank`` / ``rank`` / ``row_number`` over
``Window.partitionBy("year").orderBy(col("total_amount").desc())``
(``/root/reference/Silver_Orders.py:48-96``) and the SQL ``ROW_NUMBER``
duplicate detector (``/root/reference/Gold_Customers.py:2-7``).

Scale note: a window shuffles once on its partition key and sorts within
partitions.  Ranking functions need no frame buffering (running state only).
The hazard at 100 TB is *partition skew* — one giant ``year`` partition
serializes on one task.  ``ranked`` therefore accepts multi-column partition
keys, and callers who rank within a low-cardinality key at extreme volume
should pre-aggregate or sub-bucket; AQE skew handling does not split window
partitions (only joins), so the operator is the right place to care.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F

_RANK_FNS = {
    "rank": F.rank,
    "dense_rank": F.dense_rank,
    "row_number": F.row_number,
}


def spec(partition_by: list[str], order_by: list[tuple[str, bool]]) -> WindowSpec:
    """Build a window spec; ``order_by`` is ``(column, descending)`` pairs."""
    order: list[Column] = [
        F.col(c).desc() if d else F.col(c).asc() for c, d in order_by
    ]
    return Window.partitionBy(*[F.col(c) for c in partition_by]).orderBy(*order)


def ranked(
    df: DataFrame,
    kind: str,
    partition_by: list[str],
    order_by: list[tuple[str, bool]],
    out: str,
) -> DataFrame:
    """W1-W3: attach a rank-family column.

    ``kind`` ∈ {rank, dense_rank, row_number}.  Parity:
    ``/root/reference/Silver_Orders.py:48,57,62`` (wrapped ``:71-87``).
    """
    return df.withColumn(out, _RANK_FNS[kind]().over(spec(partition_by, order_by)))


def ranked_all(
    df: DataFrame,
    partition_by: list[str],
    order_by: list[tuple[str, bool]],
    prefix: str = "",
    shards: int | None = None,
    hot_threshold: int | None = None,
) -> DataFrame:
    """W6: apply all three ranking functions over one shared spec.

    The reference applies them sequentially via its ``windows`` class
    (``/root/reference/Silver_Orders.py:89-96``); sharing one WindowSpec lets
    Spark compute all three in a single Window physical operator — one
    shuffle + one sort instead of three.

    ``shards`` routes through the skew-proof sub-sharded rank path
    (``operators.skew.sub_sharded_ranked``, round 13): a hot partition
    key — the reference's ``year`` at 100 TB — no longer serializes on
    one task; per-shard local ranks stitch with broadcast count offsets
    to the bit-identical result.  Requires a numeric, non-null first
    order column.  ``hot_threshold`` shards only keys at least that
    large (mixed populations)."""
    if shards is not None:
        from .skew import sub_sharded_ranked

        return sub_sharded_ranked(
            df, partition_by, order_by, kinds=tuple(_RANK_FNS),
            prefix=prefix, shards=shards, hot_threshold=hot_threshold,
        )
    w = spec(partition_by, order_by)
    return df.withColumns(
        {f"{prefix}{k}": fn().over(w) for k, fn in _RANK_FNS.items()}
    )


def duplicates(
    df: DataFrame,
    key_cols: list[str],
    out: str = "row_no",
    shards: int | None = None,
    hot_threshold: int | None = None,
) -> DataFrame:
    """W4: duplicate-key detector — rows beyond the first per key.

    Parity: ``ROW_NUMBER() OVER (PARTITION BY customer_id ORDER BY
    customer_id) ... WHERE row_no > 1`` (``/root/reference/Gold_Customers.py:2-7``).
    The reference orders by the partition key itself, so the numbering
    within a key is ARBITRARY and only the (key, row_no) SET is
    deterministic — which is why ``shards`` can route through the
    hash-sharded ``skew.sub_sharded_row_numbers`` path (round 13): a
    whale key's rows number across ``shards`` tasks instead of
    serializing on one, and the emitted set is identical.
    """
    if shards is not None:
        from .skew import sub_sharded_row_numbers

        numbered = sub_sharded_row_numbers(
            df, key_cols, out=out, shards=shards,
            hot_threshold=hot_threshold,
        )
        return numbered.filter(F.col(out) > 1)
    w = Window.partitionBy(*key_cols).orderBy(*[F.col(c) for c in key_cols])
    return df.withColumn(out, F.row_number().over(w)).filter(F.col(out) > 1)


def latest_per_key(
    df: DataFrame,
    key_cols: list[str],
    sequence_col: str,
    keep_col: bool = False,
    strategy: str = "agg",
) -> DataFrame:
    """W5 (corrected): latest-version pick for merge sources.

    The reference computes ``ROW_NUMBER() OVER (PARTITION BY product_id ORDER
    BY effective_start_date DESC) rn`` but never filters ``rn=1``
    (``/root/reference/Gold_Products_No_Delta_Live.py:74`` — noted in
    SURVEY.md §7.4.1); we implement the intended semantics.

    ``strategy="agg"`` — the DEFAULT since round 14 (built + equality-
    pytested r13, flipped per VERDICT r13 ask #5) — recognizes that an
    rn=1 pick IS a max-by-key: one ``max_by(struct(all columns),
    sequence)`` aggregation with map-side partials — no window, no
    per-key sort, inherently skew-proof (a whale key's rows combine in
    partial aggregates instead of serializing through one task's sort;
    the plan pins ``partial_max_by`` and no Window operator —
    ``tests/test_skew.py``).  Tie behavior matches the window's
    contract: arbitrary-but-single winner per key.  NULL sequence
    values also match the window's ``desc`` (NULLS LAST) contract:
    ``max_by`` ignores NULL ordering values, so a key whose rows ALL
    carry a NULL ``sequence_col`` would otherwise surface as a row of
    NULLs — the agg coalesces onto ``any_value(struct)`` so such keys
    return an intact arbitrary row, exactly like rn=1 under NULLS LAST
    (ADVICE r14 #1; null-sequence equality pinned in
    ``tests/test_skew.py``).  Column order is preserved, so the
    strategies are drop-in interchangeable; ``strategy="window"`` keeps
    the classic rn=1 plan for callers that need the window shape."""
    if strategy == "agg":
        others = [c for c in df.columns if c not in key_cols]
        picked = df.groupBy(*key_cols).agg(
            F.coalesce(
                F.max_by(F.struct(*others), F.col(sequence_col)),
                # all-null sequence key: max_by yields NULL; fall back to
                # an arbitrary intact row (window semantics, NULLS LAST)
                F.any_value(F.struct(*others)),
            ).alias("__w")
        )
        out = picked.select(
            *[
                F.col(c) if c in key_cols else F.col(f"__w.{c}").alias(c)
                for c in df.columns
            ]
        )
        return out.withColumn("__rn", F.lit(1)) if keep_col else out
    if strategy != "window":
        raise ValueError(f"unknown latest_per_key strategy {strategy!r}")
    w = Window.partitionBy(*key_cols).orderBy(F.col(sequence_col).desc())
    out = df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1)
    return out if keep_col else out.drop("__rn")
