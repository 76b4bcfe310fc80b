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


def enrich(
    fact: DataFrame,
    dims: list[tuple[DataFrame, str | list[str]]],
    how: str = "left",
) -> DataFrame:
    """Chained dim joins (the reference chains two: ``Gold_Orders.py:36-37``).

    All broadcast joins stack into one whole-stage-codegen pass over the fact
    scan — no materialization between joins.
    """
    out = fact
    for dim, on in dims:
        out = dim_join(out, dim, on, how=how)
    return out
