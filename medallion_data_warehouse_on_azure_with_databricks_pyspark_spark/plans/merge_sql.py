"""``MERGE INTO`` SQL entry point (SURVEY.md §3.3 entry point C).

The reference's SCD1 merge is a literal SQL string handed to
``spark.sql`` (``/root/reference/Gold_Customers.py:75-97``), planned by the
Delta extension's ``MergeIntoTable`` rules.  delta-spark cannot be
installed in this environment, so OSS ``spark.sql`` rejects MERGE — this
module supplies the missing surface: a small parser that translates the
statement into a :func:`..plans.merge.merge_dataframes` call (the same
join-and-rewrite plan Delta builds internally) plus a table rewrite
through the storage layer.

Supported grammar — everything the reference's two statements use, and the
common Delta idioms around them::

    MERGE INTO <table> [AS alias]
    USING <table | ( subquery )> [AS alias]
    ON <conjunction of predicates>
    [WHEN MATCHED [AND <cond>] THEN UPDATE SET col = expr, ... | *]
    [WHEN MATCHED [AND <cond>] THEN DELETE]
    [WHEN NOT MATCHED [AND <cond>] THEN INSERT (cols) VALUES (exprs) | *]

Same-name target/source equality conjuncts in ON become merge keys (the
join shuffles on them); every other conjunct — e.g. the SCD2 state
predicate ``target.is_current = true``
(``Gold_Products_No_Delta_Live.py:77-78``) — is carried as ``extra_on``.

``now`` pins ``current_timestamp()`` textually (F6 determinism, same
convention as ``plans.scd``).  Parsing is a single left-to-right scan;
parens and string literals are respected when splitting, so subquery
sources with window functions (``Gold_Products_No_Delta_Live.py:71-75``)
pass through intact.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import catalog as cat
from .merge import merge_dataframes


@dataclass
class MergeStatement:
    """Parsed form of a MERGE INTO statement."""

    target: str
    target_alias: str
    source: str                   # table name, or SELECT text when subquery
    source_is_query: bool
    source_alias: str
    on: str
    update_condition: str | None = None
    update_set: dict[str, str] | str | None = None      # "*" for UPDATE SET *
    delete_condition: str | None = None
    has_delete: bool = False
    insert_condition: str | None = None
    insert_values: dict[str, str] | str | None = None   # "*" for INSERT *
    keys: list[str] = field(default_factory=list)
    extra_on: list[str] = field(default_factory=list)
    #: WHEN-clause kinds ("update"/"delete"/"insert") in statement order —
    #: SQL MERGE is first-match-wins, so UPDATE-before-DELETE vs
    #: DELETE-before-UPDATE are different programs (see merge_into_sql).
    clause_order: list[str] = field(default_factory=list)


def _scan_split(text: str, pattern: str) -> list[str]:
    """Split ``text`` at top-level (outside parens/quotes) matches of the
    case-insensitive regex ``pattern``."""
    rx = re.compile(pattern, re.I)
    parts, depth, i, last, in_str = [], 0, 0, 0, False
    while i < len(text):
        ch = text[i]
        if in_str:
            if ch == "'":
                in_str = False
        elif ch == "'":
            in_str = True
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif depth == 0:
            m = rx.match(text, i)
            if m:
                parts.append(text[last:i])
                i = m.end()
                last = i
                continue
        i += 1
    parts.append(text[last:])
    return parts


def _balanced(text: str, start: int) -> tuple[str, int]:
    """Return (inner text, index past close paren) for the paren at start."""
    assert text[start] == "("
    depth, i, in_str = 0, start, False
    while i < len(text):
        ch = text[i]
        if in_str:
            if ch == "'":
                in_str = False
        elif ch == "'":
            in_str = True
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0:
                return text[start + 1:i], i + 1
        i += 1
    raise ValueError("unbalanced parentheses in MERGE statement")


_HEAD = re.compile(
    r"\s*MERGE\s+INTO\s+(?P<target>[\w.]+)"
    r"(?:\s+AS\s+(?P<alias_as>\w+)|\s+(?!USING\b)(?P<alias>\w+))?"
    r"\s+USING\s+",
    re.I,
)
_ALIAS = re.compile(r"\s*(?:AS\s+)?(?!ON\b)(\w+)?\s*", re.I)
_KEY_EQ = re.compile(r"^\s*(\w+)\s*\.\s*(\w+)\s*=\s*(\w+)\s*\.\s*(\w+)\s*$")


def parse_merge(statement: str) -> MergeStatement:
    """Parse a MERGE INTO statement into a :class:`MergeStatement`."""
    s = statement.strip().rstrip(";").strip()
    m = _HEAD.match(s)
    if not m:
        raise ValueError("not a MERGE INTO statement")
    target = m.group("target")
    target_alias = m.group("alias_as") or m.group("alias") or target.split(".")[-1]
    i = m.end()

    if s[i] == "(":
        source, i = _balanced(s, i)
        source_is_query = True
    else:
        m2 = re.match(r"[\w.]+", s[i:])
        source = m2.group(0)
        source_is_query = False
        i += m2.end()
    m3 = re.match(r"\s*(?:AS\s+)?(?P<a>(?!ON\b)\w+)?\s*ON\s+", s[i:], re.I)
    if not m3 or "ON" not in s[i:i + m3.end()].upper():
        raise ValueError("MERGE statement missing ON clause")
    source_alias = m3.group("a") or (
        source.split(".")[-1] if not source_is_query else "source"
    )
    i += m3.end()

    rest = s[i:]
    chunks = _scan_split(rest, r"\bWHEN\s")
    on = chunks[0].strip()
    spec = MergeStatement(
        target=target, target_alias=target_alias,
        source=source, source_is_query=source_is_query,
        source_alias=source_alias, on=on,
    )

    for conjunct in _scan_split(on, r"\bAND\s"):
        eq = _KEY_EQ.match(conjunct)
        if eq:
            a1, c1, a2, c2 = eq.groups()
            aliases = {a1.lower(), a2.lower()}
            if (
                aliases == {target_alias.lower(), source_alias.lower()}
                and c1.lower() == c2.lower()
            ):
                spec.keys.append(c1)
                continue
        spec.extra_on.append(conjunct.strip())

    for clause in chunks[1:]:
        head_then = _scan_split(clause, r"\bTHEN\s")
        if len(head_then) != 2:
            raise ValueError(f"malformed WHEN clause: WHEN {clause!r}")
        head, action = head_then[0].strip(), head_then[1].strip()
        hm = re.match(
            r"(?P<not>NOT\s+)?MATCHED(?:\s+BY\s+TARGET)?(?:\s+AND\s+(?P<cond>.*))?$",
            head, re.I | re.S,
        )
        if not hm:
            raise ValueError(f"malformed WHEN clause head: {head!r}")
        cond = hm.group("cond").strip() if hm.group("cond") else None
        if hm.group("not"):
            im = re.match(r"INSERT\s*(?P<star>\*)?\s*", action, re.I)
            if not im:
                raise ValueError(f"NOT MATCHED action must be INSERT: {action!r}")
            spec.insert_condition = cond
            spec.clause_order.append("insert")
            if im.group("star"):
                spec.insert_values = "*"
            else:
                cols_txt, j = _balanced(action, action.index("("))
                vm = re.match(r"\s*VALUES\s*", action[j:], re.I)
                if not vm:
                    raise ValueError("INSERT column list must be followed by VALUES")
                vals_txt, _ = _balanced(action, j + vm.end())
                cols = [c.strip() for c in _scan_split(cols_txt, r",")]
                vals = [v.strip() for v in _scan_split(vals_txt, r",")]
                if len(cols) != len(vals):
                    raise ValueError("INSERT column/value count mismatch")
                spec.insert_values = dict(zip(cols, vals))
        elif re.match(r"DELETE\s*$", action, re.I):
            spec.has_delete = True
            spec.delete_condition = cond
            spec.clause_order.append("delete")
        else:
            um = re.match(r"UPDATE\s+SET\s+(?P<set>.*)$", action, re.I | re.S)
            if not um:
                raise ValueError(f"MATCHED action must be UPDATE SET or DELETE: {action!r}")
            spec.update_condition = cond
            spec.clause_order.append("update")
            set_txt = um.group("set").strip()
            if set_txt == "*":
                spec.update_set = "*"
            else:
                assignments: dict[str, str] = {}
                for a in _scan_split(set_txt, r","):
                    lhs, _, rhs = a.partition("=")
                    col = lhs.strip().split(".")[-1]
                    assignments[col] = rhs.strip()
                spec.update_set = assignments
    return spec


def _rewrite(expr: str, talias: str, salias: str, now: str | None) -> str:
    """Map statement aliases onto the merge engine's ``t``/``s`` frames and
    pin ``current_timestamp()`` when ``now`` is given.

    Both aliases are substituted in ONE pass (alternation + callback): a
    sequential two-pass rewrite would clobber itself when the statement
    uses the reserved names swapped (``target AS s``, ``source AS t`` —
    ``s.x`` → ``t.x`` in pass 1, then back to ``s.x`` in pass 2, silently
    remapping every target reference onto the source frame)."""
    if talias.lower() == salias.lower():
        raise ValueError(f"target and source aliases collide: {talias!r}")
    rx = re.compile(
        rf"\b(?:(?P<t>{re.escape(talias)})|(?P<s>{re.escape(salias)}))\s*\.",
        re.I,
    )
    expr = rx.sub(lambda m: "t." if m.group("t") is not None else "s.", expr)
    if now is not None:
        expr = re.sub(
            r"current_timestamp\s*\(\s*\)", f"TIMESTAMP '{now}'", expr, flags=re.I
        )
    return expr.strip()


def merge_into_sql(
    spark: SparkSession,
    statement: str,
    now: str | None = None,
    persist: bool = True,
    broadcast_source: bool = True,
) -> DataFrame:
    """Run a ``MERGE INTO`` SQL statement against a catalog table.

    Parses the statement, executes the equivalent
    :func:`merge_dataframes` plan, and (by default) rewrites the target
    table — the behavioral contract of
    ``spark.sql("MERGE INTO ...")`` on Databricks
    (``/root/reference/Gold_Customers.py:97``).  Returns the new target
    state.

    ``now`` pins ``current_timestamp()`` for reproducible audit columns;
    leave ``None`` for wall-clock parity with the reference.
    """
    spec = parse_merge(statement)
    target_df = spark.read.table(spec.target)
    source_df = (
        spark.sql(spec.source) if spec.source_is_query else spark.table(spec.source)
    )
    ta, sa = spec.target_alias, spec.source_alias

    def rw(e: str) -> str:
        return _rewrite(e, ta, sa, now)

    update_set: dict[str, Column] | None
    if spec.update_set == "*":
        src_cols = {c.lower() for c in source_df.columns}
        update_set = {
            c: F.expr(f"s.{c}") for c in target_df.columns if c.lower() in src_cols
        }
    elif spec.update_set is not None:
        update_set = {c: F.expr(rw(e)) for c, e in spec.update_set.items()}
    else:
        update_set = None

    insert_values: dict[str, Column] | None
    if spec.insert_values == "*":
        insert_values = {}              # engine default: same-name source col
    elif spec.insert_values is not None:
        given = {c.lower(): rw(e) for c, e in spec.insert_values.items()}
        # SQL INSERT-with-column-list: unmentioned columns are NULL.
        insert_values = {
            c: F.expr(given[c.lower()]) if c.lower() in given else F.lit(None)
            for c in target_df.columns
        }
    else:
        insert_values = None

    extra_on = " AND ".join(f"({rw(e)})" for e in spec.extra_on) or None

    # SQL MERGE is first-match-wins in statement order, but the engine
    # evaluates DELETE before UPDATE.  When the statement lists UPDATE
    # before DELETE, restrict the delete to rows the UPDATE clause does NOT
    # claim (an unconditional UPDATE first makes the DELETE dead code).
    delete_condition: str | None = None
    if spec.has_delete:
        delete_condition = rw(spec.delete_condition) if spec.delete_condition else "true"
        update_first = (
            "update" in spec.clause_order
            and "delete" in spec.clause_order
            and spec.clause_order.index("update") < spec.clause_order.index("delete")
        )
        if update_first:
            if spec.update_condition is None:
                delete_condition = "false"
            else:
                # coalesce: a NULL update condition is "not true" in SQL —
                # the row falls through to the DELETE clause; a bare
                # NOT (NULL) would poison the whole conjunction to NULL.
                delete_condition = (
                    f"({delete_condition}) AND NOT "
                    f"coalesce(({rw(spec.update_condition)}), false)"
                )

    new_state = merge_dataframes(
        target_df,
        source_df,
        keys=spec.keys,
        update_condition=rw(spec.update_condition) if spec.update_condition else None,
        update_set=update_set,
        insert_values=insert_values,
        insert_condition=(
            rw(spec.insert_condition) if spec.insert_condition else None
        ),
        delete_condition=delete_condition,
        broadcast_source=broadcast_source,
        extra_on=extra_on,
    )
    if not persist:
        return new_state
    # Break lineage so the overwrite never reads the files it replaces
    # (Delta gets this from MVCC; the parquet fallback from materialization).
    new_state = new_state.localCheckpoint(eager=True)
    new_state.write.mode("overwrite").format("parquet").saveAsTable(spec.target)
    spark.catalog.refreshTable(spec.target)
    return spark.read.table(spec.target)
