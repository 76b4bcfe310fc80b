"""Star-schema fact build + upsert (SURVEY.md §2.3 J1/J2, §2.8 M3/M4).

Parity: ``/root/reference/Gold_Orders.py`` — enrich the incremental order
batch with dimension surrogate keys via left broadcast joins (``:36-37``),
attach audit columns (``:42-53``), then Delta-merge on the fact key
(``:60-81``).  Our merge is the engine's pure-DataFrame MERGE.

Scale: the fact side is the 100 TB table — it must stream map-side through
broadcast dim joins (never shuffle), and the persisted fact should be
partitioned on a pruning key (e.g. order year) so incremental upserts rewrite
only touched partitions (``merge.prune_partitions``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..operators.joins import enrich
from .merge import merge_dataframes, s


def build_fact(
    base: DataFrame,
    dims: list[tuple[DataFrame, str | list[str]]],
    select_cols: list[str | Column] | None = None,
    now: Column | str | None = None,
) -> DataFrame:
    """J1/J2 + P4: enrich a base batch with dim keys and audit columns.

    ``dims`` = [(dim_df_with_skey, join_key), ...] — each joined LEFT with a
    broadcast hint (missing FK ⇒ NULL skey, as in the reference).
    ``created_dt``/``updated_dt`` audit columns mirror
    ``/root/reference/Gold_Orders.py:51-52``.
    """
    ts = (
        F.current_timestamp()
        if now is None
        else (F.lit(now).cast("timestamp") if isinstance(now, str) else now)
    )
    fact = enrich(base, dims, how="left")
    if select_cols is not None:
        fact = fact.select(*select_cols)
    return fact.withColumn("created_dt", ts).withColumn("updated_dt", ts)


def fact_upsert(
    target: DataFrame,
    batch: DataFrame,
    key: str | list[str],
    now: Column | str | None = None,
) -> DataFrame:
    """M3: fact-table upsert (``/root/reference/Gold_Orders.py:60-81``).

    WHEN MATCHED → refresh all non-audit columns + ``updated_dt``;
    WHEN NOT MATCHED → insert the batch row.  (The reference's matched
    branch updates only ``updated_dt``; we refresh attributes too, which is
    the useful semantic — for changed order lines — and identical output on
    its test flow where matched rows are re-sent unchanged.)
    """
    keys = [key] if isinstance(key, str) else key
    ts = (
        F.current_timestamp()
        if now is None
        else (F.lit(now).cast("timestamp") if isinstance(now, str) else now)
    )
    attrs = [c for c in target.columns if c not in (*keys, "created_dt", "updated_dt")]
    update_set: dict[str, Column] = {c: s(c) for c in attrs if c in batch.columns}
    update_set["updated_dt"] = ts
    insert_values: dict[str, Column] = {
        c: s(c) for c in target.columns if c in batch.columns
    }
    # Audit columns come from the merge clock, not the batch
    # (``/root/reference/Gold_Orders.py:78-79``).
    insert_values["created_dt"] = ts
    insert_values["updated_dt"] = ts
    return merge_dataframes(
        target, batch, keys, update_set=update_set, insert_values=insert_values
    )
