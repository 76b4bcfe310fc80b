"""Data-quality expectations (SURVEY.md §2.11 Q1/Q2).

Parity: DLT's rule dicts + ``expect_all_or_drop``
(``/root/reference/Gold_Products.py:71-82``), plus the warn-only ``expect``
and failing ``expect_all_or_fail`` modes the notebook documents
(``Gold_Products.py:44-51``).

Rules are SQL boolean expressions evaluated as native Catalyst predicates —
they push down into the scan like any filter; violation counting is a single
aggregate pass.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class ExpectationError(Exception):
    """Raised by :func:`expect_all_or_fail` when any rule is violated."""


def _conjunction(rules: dict[str, str]) -> Column:
    return reduce(lambda a, b: a & b, [F.expr(r) for r in rules.values()])


@dataclass
class ExpectationReport:
    """Violation counts per rule + total rows, from one aggregate pass."""

    total_rows: int
    violations: dict[str, int]

    @property
    def ok(self) -> bool:
        return all(v == 0 for v in self.violations.values())


def check(df: DataFrame, rules: dict[str, str]) -> ExpectationReport:
    """Q1 'expect' (warn-only): count violations without filtering.

    One job, one aggregate — ``sum(rule is violated)`` per rule; no per-rule
    passes over the data.
    """
    aggs = [
        F.sum(F.when(~F.expr(rule), 1).otherwise(0)).alias(name)
        for name, rule in rules.items()
    ]
    row = df.agg(F.count(F.lit(1)).alias("__total"), *aggs).collect()[0]
    return ExpectationReport(
        total_rows=row["__total"],
        violations={name: row[name] or 0 for name in rules},
    )


def expect_all_or_drop(df: DataFrame, rules: dict[str, str]) -> DataFrame:
    """Q2: drop rows violating any rule
    (``dlt.expect_all_or_drop``, ``/root/reference/Gold_Products.py:82``).

    Pure filter — composes with pushdown; pair with :func:`check` when the
    violation counts need surfacing.
    """
    return df.filter(_conjunction(rules))


def expect_all_or_quarantine(
    df: DataFrame, rules: dict[str, str]
) -> tuple[DataFrame, DataFrame]:
    """Quarantine mode: split into ``(passed, quarantined)`` where
    quarantined rows keep every source column plus ``violated_rules`` —
    the array of rule NAMES the row broke — so a data steward can triage
    and replay them (DLT-grade pipelines route violations to a quarantine
    table instead of discarding them like ``expect_all_or_drop``).

    Both sides are pure Catalyst projections/filters over the input (each
    rule predicate is evaluated once per row per side, pushdown-friendly,
    streaming-safe); a caller materializing both sides pays two scans of
    the source unless it persists — the pipeline integration writes each
    side to its own sink, which is exactly that shape.
    """
    # "not TRUE" counts as a violation (NULL-evaluating rules quarantine,
    # matching expect_all_or_drop, whose filter keeps only TRUE rows)
    viol = F.array_compact(
        F.array(
            *[
                F.when(~F.coalesce(F.expr(rule), F.lit(False)), F.lit(name))
                for name, rule in rules.items()
            ]
        )
    )
    tagged = df.withColumn("violated_rules", viol)
    passed = tagged.filter(F.size("violated_rules") == 0).drop(
        "violated_rules"
    )
    quarantined = tagged.filter(F.size("violated_rules") > 0)
    return passed, quarantined


def expect_all_or_fail(df: DataFrame, rules: dict[str, str]) -> DataFrame:
    """'expect_or_fail' mode (``/root/reference/Gold_Products.py:49-51``):
    raise if any row violates any rule, else pass the input through."""
    report = check(df, rules)
    if not report.ok:
        bad = {k: v for k, v in report.violations.items() if v}
        raise ExpectationError(f"expectations violated: {bad}")
    return df
