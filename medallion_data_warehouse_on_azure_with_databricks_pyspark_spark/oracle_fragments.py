"""Shared DuckDB-oracle SQL fragment builders.

Leaf module (imports nothing from the package) so every workload sibling
can use these at module-import time without creating a circular import —
``workload_ext`` ↔ ``workload_llm`` must never import each other directly
because the package ``__init__`` imports them in a fixed order.

The fragments mirror the engine's Spark expressions exactly:

* :data:`TOKS` — the whitespace tokenizer (``operators/text.py tokens``);
* :func:`fold_dot` / :func:`fold_norm` — ordered left folds seeded at
  ``0.0::DOUBLE``, bit-identical to Spark ``F.aggregate`` with a 0.0 seed
  (float addition associates left in both engines).
"""

from __future__ import annotations

#: DuckDB twin of the engine's whitespace tokenizer.
TOKS = r"string_split_regex(trim(lower(text)), '\s+')"


def fold_dot(a: str, b: str) -> str:
    """Ordered-fold dot product of two list expressions (DOUBLE, bit-exact
    vs Spark's ``F.aggregate`` with 0.0 seed)."""
    return (
        f"list_reduce(list_prepend(0.0::DOUBLE, "
        f"list_transform(range(1, len({a}) + 1), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE))), "
        f"(x, y) -> x + y)"
    )


def fold_l2sq(a: str, b: str) -> str:
    """Ordered-fold squared L2 distance (DOUBLE, bit-exact vs Spark's
    ``similarity._l2sq`` zip-with fold)."""
    d = f"(CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE))"
    return (
        f"list_reduce(list_prepend(0.0::DOUBLE, "
        f"list_transform(range(1, len({a}) + 1), i -> {d} * {d})), "
        f"(x, y) -> x + y)"
    )


def fold_norm(a: str) -> str:
    """Ordered-fold L2 norm of a list expression (see :func:`fold_dot`)."""
    return (
        f"sqrt(list_reduce(list_prepend(0.0::DOUBLE, "
        f"list_transform(range(1, len({a}) + 1), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({a}[i] AS DOUBLE))), "
        f"(x, y) -> x + y))"
    )


def hex8(expr: str, lo: int) -> str:
    """uint32 from 8 hex digits of ``expr`` starting at 1-based ``lo`` —
    the DuckDB twin of ``operators/curation.py _hash_u32`` (md5-window
    hashing for deterministic sampling/splits)."""
    terms = " + ".join(
        f"(strpos('0123456789abcdef', substr({expr}, {lo + i}, 1)) - 1)"
        f" * {16 ** (7 - i)}"
        for i in range(8)
    )
    return f"({terms})"
