"""Skew-mitigation operators: salted aggregation and salted joins.

At 100 TB a handful of hot keys (one `year`, one boilerplate document
fingerprint, one whale customer) can pin an entire stage on one task.  AQE's
skew-join splitting (on in ``session.ENGINE_CONF``) handles *sort-merge
joins* at runtime; salting is still needed for

* **aggregation skew** — a shuffle agg sends every row of a hot group to
  one reducer.  ``salted_group_agg`` splits each group into ``buckets``
  sub-groups, partially aggregates, then merges the partials: two small
  shuffles instead of one skewed one.  Only *algebraic* aggregates
  (sum/count/min/max — partials merge losslessly) are supported; the merge
  step re-aggregates partial sums, so results are identical to the direct
  aggregation (that identity is the oracle check).
* **join skew where the dim exceeds the broadcast threshold** —
  ``salted_join`` replicates the right side ``buckets``× with an exploded
  salt column and joins on (key, salt); each hot key's rows spread over
  ``buckets`` tasks.

The salt must be deterministic for reproducible plans/tests: we hash a
caller-named unique column (``xxhash64 % buckets``), not ``rand()``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Algebraic aggregates: (partial agg fn, merge agg fn over partials).
_ALGEBRAIC = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salt_column(unique_col: str | Column, buckets: int) -> Column:
    """Deterministic salt in [0, buckets) from a unique (or near-unique)
    column — same input data ⇒ same salt ⇒ reproducible partials."""
    c = F.col(unique_col) if isinstance(unique_col, str) else unique_col
    return F.pmod(F.xxhash64(c), F.lit(buckets))


def salted_group_agg(
    df: DataFrame,
    keys: list[str],
    aggs: list[tuple[str, Column | str, str]],
    salt_from: str | Column,
    buckets: int = 32,
) -> DataFrame:
    """Two-phase skew-proof aggregation.

    ``aggs``: list of ``(out_alias, input_col, kind)`` with kind in
    sum/count/min/max.  Phase 1 aggregates (keys + salt) — at most
    ``buckets`` partial rows per group, evenly spread; phase 2 merges
    partials per key.  The phase-2 input is tiny (groups × buckets), so the
    skewed key never concentrates raw rows on one task.
    """
    for _, _, kind in aggs:
        if kind not in _ALGEBRAIC:
            raise ValueError(f"non-algebraic aggregate {kind!r} cannot be salted")
    salted = df.withColumn("__salt", salt_column(salt_from, buckets))
    partial = salted.groupBy(*keys, "__salt").agg(
        *[
            _ALGEBRAIC[kind][0](F.col(c) if isinstance(c, str) else c).alias(f"__p_{alias}")
            for alias, c, kind in aggs
        ]
    )
    return partial.groupBy(*keys).agg(
        *[
            _ALGEBRAIC[kind][1](F.col(f"__p_{alias}")).alias(alias)
            for alias, _, kind in aggs
        ]
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt_from: str | Column,
    buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-proof equi-join: salt the big side deterministically, replicate
    the small side once per salt value, join on (key, salt).

    Right-side blow-up is ``buckets``× — use for dims too big to broadcast
    but far smaller than the fact.  Output equals ``big.join(small, on,
    how)`` for inner/left joins (each big row matches exactly its salt's
    replica).
    """
    salted_big = big.withColumn("__salt", salt_column(salt_from, buckets))
    replicated = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(buckets)]))
    )
    out = salted_big.join(replicated, [on, "__salt"], how)
    return out.drop("__salt")
