"""``ALTER TABLE`` SQL entry point — the DDL companion of
``plans/merge_sql.py`` (SURVEY.md §3.3's SQL-first surface): the
reference drives its warehouse through literal SQL statements, and the
Delta extension that would plan ALTER TABLE cannot be installed here,
so this module translates the statements into the storage layer's
operations.

Supported grammar (each maps to one versioned-table call)::

    ALTER TABLE delta.`<path>` RENAME COLUMN a TO b
    ALTER TABLE delta.`<path>` DROP COLUMN a
    ALTER TABLE delta.`<path>` ADD CONSTRAINT name CHECK (expr)
    ALTER TABLE delta.`<path>` DROP CONSTRAINT name
    ALTER TABLE delta.`<path>` CLUSTER BY (col [, col ...])
    ALTER TABLE delta.`<path>` CLUSTER BY NONE

The table reference accepts Delta's path form (``delta.`/p/t```), a
bare backtick-quoted path, or an unquoted path.  RENAME/DROP COLUMN
are METADATA-ONLY commits (column mapping — zero data I/O; see
``sources/versioned.rename_column_versioned``) and return the new
version; constraint and clustering changes are table properties and
return None.  All the storage layer's refusals (partition / clustering
/ constraint-referenced / identity columns, column-mapped pruning
surfaces) pass through loudly."""

from __future__ import annotations

import re

from pyspark.sql import SparkSession

from ..sources import versioned as V

_TABLE = r"(?:delta\s*\.\s*)?`(?P<q>[^`]+)`|(?P<bare>\S+)"


def _path_of(ref: str) -> str:
    m = re.fullmatch(_TABLE, ref.strip(), re.IGNORECASE)
    if not m:
        raise ValueError(f"unparseable table reference: {ref!r}")
    return m.group("q") or m.group("bare")


def alter_table_sql(
    spark: SparkSession, stmt: str, now: float | None = None
) -> int | None:
    """Parse and execute one ALTER TABLE statement.  Returns the newly
    committed version for the metadata-commit forms (RENAME/DROP
    COLUMN), None for property-only forms."""
    s = " ".join(stmt.strip().rstrip(";").split())
    m = re.match(r"ALTER\s+TABLE\s+(?P<ref>delta\s*\.\s*`[^`]+`|`[^`]+`|\S+)\s+(?P<rest>.+)$",
                 s, re.IGNORECASE)
    if not m:
        raise ValueError(f"unparseable ALTER TABLE statement: {stmt!r}")
    path = _path_of(m.group("ref"))
    rest = m.group("rest")

    r = re.fullmatch(
        r"RENAME\s+COLUMN\s+`?(\w+)`?\s+TO\s+`?(\w+)`?", rest, re.IGNORECASE
    )
    if r:
        return V.rename_column_versioned(path, r.group(1), r.group(2),
                                         now=now)
    r = re.fullmatch(r"DROP\s+COLUMN\s+`?(\w+)`?", rest, re.IGNORECASE)
    if r:
        return V.drop_column_versioned(path, r.group(1), now=now)
    r = re.fullmatch(
        r"ADD\s+CONSTRAINT\s+(\w+)\s+CHECK\s*\((.+)\)", rest, re.IGNORECASE
    )
    if r:
        rules = V.get_constraints(path)
        rules[r.group(1)] = r.group(2).strip()
        V.set_constraints(path, rules)
        return None
    r = re.fullmatch(r"DROP\s+CONSTRAINT\s+(\w+)", rest, re.IGNORECASE)
    if r:
        rules = V.get_constraints(path)
        if r.group(1) not in rules:
            raise ValueError(f"{path}: no constraint {r.group(1)!r}")
        rules.pop(r.group(1))
        V.set_constraints(path, rules)
        return None
    r = re.fullmatch(r"CLUSTER\s+BY\s+NONE", rest, re.IGNORECASE)
    if r:
        V.set_clustering(spark, path, [])
        return None
    r = re.fullmatch(r"CLUSTER\s+BY\s*\(([^)]+)\)", rest, re.IGNORECASE)
    if r:
        cols = [c.strip().strip("`") for c in r.group(1).split(",")]
        V.set_clustering(spark, path, cols)
        return None
    raise ValueError(f"unsupported ALTER TABLE form: {rest!r}")
