"""Join operators (SURVEY.md §2.3): dimension-enrichment joins.

Parity target: the fact build's chained left equi-joins to customer/product
dims (``/root/reference/Gold_Orders.py:36-37``).  The reference leans on
Catalyst auto-broadcast; we make the intent explicit with ``F.broadcast`` on
the dimension side — at 100 TB the fact side must never shuffle for a dim
join, and an explicit hint survives stale size statistics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dim_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str | list[str],
    how: str = "left",
    broadcast_dim: bool = True,
) -> DataFrame:
    """J1/J2: left equi-join fact → dimension.

    ``on`` as column name(s) (equi-key both sides) avoids the reference's
    duplicate-column hazard (``/root/reference/Gold_Orders.py:33,36-37``
    selects ``product_id as product_skey, product_id`` and joins on ambiguous
    names) — Spark coalesces USING-columns into one output column.

    ``broadcast_dim=True`` (default) pins a broadcast-hash join: the dim is
    shipped to every executor and the 100 TB fact side streams through
    map-side with zero shuffle.  Set ``False`` for dims too large to
    broadcast; then pre-bucket both sides on the key to get a shuffle-free
    sort-merge join.
    """
    right = F.broadcast(dim) if broadcast_dim else dim
    return fact.join(right, on=on, how=how)


def fact_join(
    fact: DataFrame,
    other: DataFrame,
    on: str | list[str],
    how: str = "left",
) -> DataFrame:
    """Join two fact-scale relations — neither side fits in a broadcast.

    At 100 TB a fact⋈fact join (e.g. lineitem⋈orders) must be a
    co-partitioned sort-merge join: both sides shuffle on the key once, and
    at rest the shuffle disappears entirely if both tables are bucketed on
    the key.  The explicit ``merge`` hint encodes that intent so a stale
    size statistic can never talk the planner into broadcasting a
    25 TB table.  At small scale AQE may still locally optimize the
    exchanges; that is fine — the *declared* plan never requires the big
    side to fit in memory.
    """
    return fact.join(other.hint("merge"), on=on, how=how)


def enrich(
    fact: DataFrame,
    dims: list[tuple],
    how: str = "left",
) -> DataFrame:
    """Chained dim joins (the reference chains two: ``Gold_Orders.py:36-37``).

    Each entry is ``(dim, on)`` or ``(dim, on, strategy)`` with strategy
    ``"broadcast"`` (default — true dimensions) or ``"merge"`` (fact-scale
    sides, routed through :func:`fact_join`).  All broadcast joins stack
    into one whole-stage-codegen pass over the fact scan — no
    materialization between joins; a ``merge`` entry introduces the one
    key-shuffle that join genuinely needs.
    """
    out = fact
    for entry in dims:
        dim, on, *rest = entry
        strategy = rest[0] if rest else "broadcast"
        if strategy == "merge":
            out = fact_join(out, dim, on, how=how)
        else:
            out = dim_join(out, dim, on, how=how)
    return out
