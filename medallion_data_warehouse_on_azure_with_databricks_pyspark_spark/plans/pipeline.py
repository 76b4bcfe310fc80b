"""Declarative pipeline framework (SURVEY.md §2.8 M5, §2.12, entry point D).

A ~150-line open-source stand-in for the reference's Delta Live Tables usage
(``/root/reference/Gold_Products.py:84-105``): ``@table`` / ``@view``
decorators register nodes, dependencies are declared by *parameter name*
(a node function's argument names are the upstream node names — the same
implicit-graph style as ``dlt.read``), execution is topologically ordered,
expectations run per-node, and ``apply_changes`` nodes translate to the
engine's corrected two-phase SCD merges.

The reference's orchestration layer — widget parameters and a dataset
fan-out list (``/root/reference/Bronze_Layer.py:7-11``,
``parameters.py:2-19``) — maps to plain constructor/config arguments here
(X1/X2).
"""

from __future__ import annotations

import inspect
from collections.abc import Callable
from dataclasses import dataclass, field
from graphlib import TopologicalSorter

from pyspark.sql import DataFrame, SparkSession

from . import expectations as ex
from . import scd


@dataclass
class Node:
    name: str
    fn: Callable[..., DataFrame]
    deps: list[str]
    kind: str = "table"                       # "table" | "view"
    expect_all_or_drop: dict[str, str] | None = None
    expect_all_or_fail: dict[str, str] | None = None
    expect: dict[str, str] | None = None      # warn-only
    comment: str = ""


@dataclass
class RunResult:
    outputs: dict[str, DataFrame]
    expectation_reports: dict[str, ex.ExpectationReport] = field(default_factory=dict)


class Pipeline:
    """Registry + topo-sorted executor for declarative live tables."""

    def __init__(self, name: str = "pipeline"):
        self.name = name
        self._nodes: dict[str, Node] = {}

    # -- registration -------------------------------------------------------

    def table(
        self,
        fn: Callable[..., DataFrame] | None = None,
        *,
        name: str | None = None,
        comment: str = "",
        expect_all_or_drop: dict[str, str] | None = None,
        expect_all_or_fail: dict[str, str] | None = None,
        expect: dict[str, str] | None = None,
    ):
        """``@dlt.table`` equivalent (``/root/reference/Gold_Products.py:84``).

        Dependencies = the decorated function's parameter names (each must be
        a registered node); a ``spark`` parameter injects the session instead.
        """

        def deco(f: Callable[..., DataFrame]):
            node_name = name or f.__name__
            deps = [p for p in inspect.signature(f).parameters if p != "spark"]
            self._nodes[node_name] = Node(
                name=node_name, fn=f, deps=deps, kind="table",
                expect_all_or_drop=expect_all_or_drop,
                expect_all_or_fail=expect_all_or_fail,
                expect=expect, comment=comment,
            )
            return f

        return deco(fn) if fn is not None else deco

    def view(self, fn=None, **kwargs):
        """``@dlt.view`` equivalent (``/root/reference/Gold_Products.py:91``)."""

        def deco(f):
            out = self.table(f, **kwargs)
            self._nodes[kwargs.get("name") or f.__name__].kind = "view"
            return out

        return deco(fn) if fn is not None else deco

    def apply_changes(
        self,
        target: str,
        source: str,
        keys: list[str],
        sequence_by: str,
        stored_as_scd_type: int = 2,
        track_history_column_list: list[str] | None = None,
        now=None,
        skey=None,
    ) -> None:
        """M5: ``dlt.create_streaming_table`` + ``dlt.apply_changes``
        (``/root/reference/Gold_Products.py:96-105``) as one node: the CDC
        feed named ``source`` folds into the SCD state named ``target``.

        Initial-load vs merge branching (M4) happens per run: with no prior
        state the node produces the initial dimension.
        """

        def fold(src: DataFrame) -> DataFrame:
            return scd.apply_changes(
                None,  # stateless within a run; persistent state via storage layer
                src,
                keys,
                sequence_by,
                stored_as_scd_type=stored_as_scd_type,
                track_history_column_list=track_history_column_list,
                now=now,
                skey=skey,
            )

        self._nodes[target] = Node(name=target, fn=fold, deps=[source], kind="table")

    # -- execution ----------------------------------------------------------

    def order(self) -> list[str]:
        """Topological execution order; raises on cycles/unknown deps."""
        graph = {}
        for n in self._nodes.values():
            for d in n.deps:
                if d not in self._nodes:
                    raise ValueError(f"node '{n.name}' depends on unknown '{d}'")
            graph[n.name] = set(n.deps)
        return list(TopologicalSorter(graph).static_order())

    def run(self, spark: SparkSession) -> RunResult:
        """Execute every node once, expectations applied in declared order."""
        outputs: dict[str, DataFrame] = {}
        reports: dict[str, ex.ExpectationReport] = {}
        for name in self.order():
            node = self._nodes[name]
            params = inspect.signature(node.fn).parameters
            # Non-spark params bind positionally to node.deps (normally the
            # param *names* are the dep names; apply_changes folds differ).
            dep_iter = iter(node.deps)
            kwargs = {
                p: (spark if p == "spark" else outputs[next(dep_iter)])
                for p in params
            }
            df = node.fn(**kwargs)
            if node.expect is not None:
                reports[name] = ex.check(df, node.expect)
            if node.expect_all_or_fail is not None:
                df = ex.expect_all_or_fail(df, node.expect_all_or_fail)
            if node.expect_all_or_drop is not None:
                df = ex.expect_all_or_drop(df, node.expect_all_or_drop)
            outputs[name] = df
        return RunResult(outputs=outputs, expectation_reports=reports)
