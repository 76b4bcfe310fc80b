"""MERGE engine (SURVEY.md §2.8): SQL-MERGE semantics as a pure DataFrame op.

The reference's merges are Delta ``MERGE INTO`` statements
(``/root/reference/Gold_Customers.py:75-97``,
``Gold_Products_No_Delta_Live.py:69-95``) and the ``DeltaTable.merge``
builder (``Gold_Orders.py:60-81``).  delta-spark is not guaranteed in this
environment, so the engine implements MERGE as a **pure function**
``(target, source) -> new_target_state`` built from one full-outer join —
the same plan Delta produces internally — and leaves persistence to the
storage layer (``sources.writers``; Delta transactional rewrite when
available, atomic directory swap otherwise).

Scale notes:

* In the dominant pattern — small change-batch vs huge dimension/fact —
  pass ``broadcast_source=True``.  Without an INSERT clause the whole merge
  is one broadcast left-outer join: the target streams map-side with zero
  shuffle.  With an INSERT clause a single join would have to be FULL OUTER,
  which Spark cannot broadcast-hash, so the engine splits the plan instead:
  the matched/update/delete path keeps the broadcast left-outer (target
  still never shuffles full rows), and inserts come from a separate
  ``source LEFT ANTI JOIN target`` whose target side Catalyst prunes to the
  ON-clause columns — the only shuffle of target data moves key columns,
  not rows.  With ``broadcast_source=False`` both sides shuffle on the
  merge keys (sort-merge; AQE handles skew).
* With a partitioned target, callers should pre-filter the target to the
  partitions present in the source (partition pruning) before merging; Delta
  does this file-level automatically, our parquet fallback does it
  partition-level via ``prune_partitions``.
* Everything is built-in expressions — no UDFs, full codegen.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_T_MARK = "__t_exists"
_S_MARK = "__s_exists"


def t(col: str) -> Column:
    """Reference the target side in a merge condition/assignment."""
    return F.col(f"t.{col}")


def s(col: str) -> Column:
    """Reference the source side in a merge condition/assignment."""
    return F.col(f"s.{col}")


def merge_dataframes(
    target: DataFrame,
    source: DataFrame,
    keys: list[str],
    update_condition: Column | str | None = None,
    update_set: dict[str, Column] | None = None,
    insert_values: dict[str, Column] | None = None,
    delete_condition: Column | str | None = None,
    broadcast_source: bool = True,
    extra_on: Column | str | None = None,
    insert_condition: Column | str | None = None,
    schema_evolution: bool = False,
) -> DataFrame:
    """ANSI-MERGE semantics, returned as the new target state.

    * ``WHEN MATCHED [AND update_condition] THEN UPDATE SET update_set``
    * ``WHEN MATCHED AND delete_condition THEN DELETE``
    * ``WHEN NOT MATCHED [AND insert_condition] THEN INSERT insert_values``
      (omit ``insert_values`` → source-only rows are ignored, i.e. no
      NOT MATCHED clause; source rows failing ``insert_condition`` are
      likewise ignored)

    Clause precedence is fixed: DELETE is evaluated before UPDATE on
    matched rows.  SQL MERGE is first-match-wins in *statement order*; a
    caller translating a statement where a conditional UPDATE precedes
    DELETE must pre-compose ``delete_condition AND NOT update_condition``
    (``plans.merge_sql`` does).

    ``update_set`` / ``insert_values`` map output-column → expression over
    the aliased sides (use :func:`t` / :func:`s`).  Unmentioned columns keep
    the target value on update; insert defaults to the source column of the
    same name when present, else NULL (matching SQL INSERT-with-columns).

    ``extra_on`` adds non-key ON conjuncts (J4 state predicates like
    ``t.is_current = true``, ``/root/reference/Gold_Products_No_Delta_Live.py:77-78``);
    target rows failing it count as unmatched and pass through untouched,
    source rows matching only such targets fall to the INSERT clause —
    exactly SQL-MERGE's treatment of a compound ON.

    Like SQL MERGE, the source must be unique per key (dedupe upstream with
    ``operators.windows.latest_per_key`` — SURVEY §2.5 W5); duplicates would
    fan out matched target rows.  Like ANSI MERGE, INSERT expressions may
    reference only the source side (``s(...)``) — there is no target row to
    read on the NOT MATCHED branch.

    ``schema_evolution=True`` is Delta's ``mergeSchema``/autoMerge: source
    columns absent from the target are APPENDED to the output schema —
    updated rows take the source value (override per column via
    ``update_set``), inserted rows take ``insert_values``/source, and
    pre-existing target rows not updated by this merge carry NULL, exactly
    the backfill state Delta leaves.  Off by default: an unexpected source
    column is usually drift, and the rescue lane is the place to catch it.
    """
    out_cols = target.columns
    evolved = (
        [c for c in source.columns if c not in set(out_cols)]
        if schema_evolution
        else []
    )
    src = F.broadcast(source) if broadcast_source else source
    tt = target.withColumn(_T_MARK, F.lit(True)).alias("t")
    ss = src.withColumn(_S_MARK, F.lit(True)).alias("s")
    conds = [t(k) == s(k) for k in keys]
    if extra_on is not None:
        conds.append(F.expr(extra_on) if isinstance(extra_on, str) else extra_on)
    if not conds:
        raise ValueError("merge needs at least one key or extra_on condition")
    on = reduce(lambda a, b: a & b, conds)
    # Join-strategy choice (see module docstring).  FULL OUTER cannot be
    # broadcast-hash, so with a broadcastable source we never run one:
    # matched rows come from a broadcast LEFT join (target streams map-side,
    # zero shuffle) and source-only rows from a separate LEFT ANTI join
    # whose target side is column-pruned to the ON columns.
    split_inserts = insert_values is not None and broadcast_source
    join_how = (
        "full_outer" if insert_values is not None and not split_inserts
        else "left_outer"
    )
    joined = tt.join(ss, on, join_how)

    matched = F.col(_T_MARK).isNotNull() & F.col(_S_MARK).isNotNull()
    t_only = F.col(_T_MARK).isNotNull() & F.col(_S_MARK).isNull()
    s_only = F.col(_T_MARK).isNull() & F.col(_S_MARK).isNotNull()

    def _cond(c: Column | str | None, default: bool) -> Column:
        if c is None:
            return F.lit(default)
        return F.expr(c) if isinstance(c, str) else c

    upd_cond = _cond(update_condition, update_set is not None)
    # SQL MERGE treats a NULL clause condition as "not true": the row falls
    # through to the next clause instead of matching this one.  `when()`
    # already skips a NULL condition, but the `keep` filter below would turn
    # ~(matched & NULL) into NULL and silently DROP the row — coalesce the
    # delete condition to false so a NULL-condition row survives to UPDATE.
    del_cond = F.coalesce(_cond(delete_condition, False), F.lit(False))
    ins_cond = _cond(insert_condition, True)

    update_set = update_set or {}
    source_cols = set(source.columns)

    ins_exprs: dict[str, Column] = {}
    projections: list[Column] = []
    for c in out_cols + evolved:
        # an evolved column has no target side: untouched/no-op rows carry
        # NULL (Delta's backfill state) and the update default is the
        # source value (SET *-style evolution)
        tgt_expr = t(c) if c not in evolved else F.lit(None)
        upd_expr = update_set.get(c, tgt_expr if c not in evolved else s(c))
        ins_exprs[c] = (
            insert_values.get(c, s(c) if c in source_cols else F.lit(None))
            if insert_values is not None
            else F.lit(None)
        )
        projections.append(
            F.when(matched & del_cond, F.lit(None))          # deleted (filtered below)
            .when(matched & upd_cond, upd_expr)              # UPDATE
            .when(matched, tgt_expr)                         # matched, no-op
            .when(t_only, tgt_expr)                          # untouched target
            .otherwise(ins_exprs[c])                         # INSERT (s_only)
            .alias(c)
        )

    keep = ~(matched & del_cond)
    if insert_values is None or split_inserts:
        keep = keep & ~s_only  # (a LEFT join can't produce s_only; harmless)
    else:
        # NOT-MATCHED condition: a source-only row failing it (or evaluating
        # NULL, = SQL "not true") is ignored, not inserted.
        keep = keep & ~(s_only & ~F.coalesce(ins_cond, F.lit(False)))
    merged = joined.filter(keep).select(*projections)
    if not split_inserts:
        return merged
    # NOT MATCHED branch: anti-join on the full ON condition.  The target
    # side is huge, but Catalyst prunes its scan/shuffle to the columns the
    # ON clause references (keys + extra_on) — never full rows.  The insert
    # condition (ANSI: source-side references only) filters before project.
    inserts = (
        source.alias("s")
        .join(target.alias("t"), on, "left_anti")
        .filter(ins_cond)
        .select(*[ins_exprs[c].alias(c) for c in out_cols + evolved])
    )
    return merged.unionByName(inserts)


def merge_versioned(
    spark,
    path: str,
    source: DataFrame,
    keys: list[str],
    max_retries: int = 3,
    now: float | None = None,
    operation: str = "MERGE",
    partition_by: list[str] | None = None,
    stats_columns: list[str] | None = None,
    **merge_kwargs,
) -> int:
    """Transactional ``MERGE INTO`` a versioned table: the
    :func:`merge_dataframes` plan runs inside
    ``sources.versioned.transact``, so the merge reads a consistent
    snapshot, commits pinned to it, and — if a concurrent commit lands
    in between — re-reads and re-merges instead of silently clobbering
    the interleaved write.  This is Delta's ``MERGE`` contract
    (``/root/reference/Gold_Orders.py:60-81`` merges into a Delta table
    under exactly this optimistic protocol); the commit appears in
    ``history`` as ``operation='MERGE'`` and flows through CDF like any
    DML.  Returns the committed version.

    The merge source is captured once and reused across retries — only
    the TARGET snapshot is re-read, matching SQL MERGE's semantics where
    the source is a fixed relation for the statement's lifetime.
    ``merge_kwargs`` pass through to :func:`merge_dataframes`
    (update/insert/delete clauses, ``extra_on``, ``schema_evolution``,
    ``broadcast_source``)."""
    from ..sources import versioned

    return versioned.transact(
        spark,
        path,
        lambda snap: merge_dataframes(snap, source, keys, **merge_kwargs),
        max_retries=max_retries,
        now=now,
        operation=operation,
        partition_by=partition_by,
        stats_columns=stats_columns,
    )


def assert_unique_source(source: DataFrame, keys: list[str]) -> None:
    """Optional SQL-MERGE cardinality check (one action; skip in hot paths)."""
    dup = (
        source.groupBy(*keys).count().filter(F.col("count") > 1).limit(1).count()
    )
    if dup:
        raise ValueError(f"merge source has duplicate keys on {keys}")


def prune_partitions(
    target: DataFrame, source: DataFrame, partition_col: str
) -> tuple[DataFrame, DataFrame]:
    """Split target into (touched, untouched) by the source's partition values.

    Parquet-fallback analogue of Delta's file skipping during MERGE: merge
    only the touched slice, union the untouched slice back unchanged, and the
    storage layer rewrites only touched partitions.  The distinct-collect is
    over partition values (small by construction), not data rows.
    """
    values = [r[0] for r in source.select(partition_col).distinct().collect()]
    touched = target.filter(F.col(partition_col).isin(values))
    untouched = target.filter(~F.col(partition_col).isin(values))
    return touched, untouched
