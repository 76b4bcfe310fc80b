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
import os
from collections.abc import Callable
from dataclasses import dataclass, field
from graphlib import TopologicalSorter

from pyspark.sql import DataFrame, SparkSession

from ..sources import catalog as cat
from . import expectations as ex
from . import scd


@dataclass
class Node:
    name: str
    fn: Callable[..., DataFrame]
    deps: list[str]
    kind: str = "table"              # "table" | "view" | "streaming_source"
    expect_all_or_drop: dict[str, str] | None = None
    expect_all_or_fail: dict[str, str] | None = None
    expect: dict[str, str] | None = None      # warn-only
    expect_all_or_quarantine: dict[str, str] | None = None
    comment: str = ""
    cdc: dict | None = None          # apply_changes config (incremental runs)


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
        expect_all_or_quarantine: dict[str, str] | None = None,
    ):
        """``@dlt.table`` equivalent (``/root/reference/Gold_Products.py:84``).

        Dependencies = the decorated function's parameter names (each must be
        a registered node); a ``spark`` parameter injects the session instead.

        ``expect_all_or_quarantine`` routes violating rows (tagged with the
        rule names they broke) to the side output ``<node>__quarantine``
        instead of discarding them — batch runs expose it in
        ``RunResult.outputs``; incremental runs materialize it as the
        catalog table ``<database>.<node>__quarantine``.
        """

        def deco(f: Callable[..., DataFrame]):
            node_name = name or f.__name__
            deps = [p for p in inspect.signature(f).parameters if p != "spark"]
            self._nodes[node_name] = Node(
                name=node_name, fn=f, deps=deps, kind="table",
                expect_all_or_drop=expect_all_or_drop,
                expect_all_or_fail=expect_all_or_fail,
                expect=expect, comment=comment,
                expect_all_or_quarantine=expect_all_or_quarantine,
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
        apply_as_deletes: str | None = None,
    ) -> None:
        """M5: ``dlt.create_streaming_table`` + ``dlt.apply_changes``
        (``/root/reference/Gold_Products.py:96-105``) as one node: the CDC
        feed named ``source`` folds into the SCD state named ``target``.

        Initial-load vs merge branching (M4) happens per run: with no prior
        state the node produces the initial dimension.

        ``apply_as_deletes`` is the DLT delete-event predicate (a SQL
        boolean expression over the feed, e.g. ``"operation = 'DELETE'"``):
        matching rows expire the key instead of upserting it — see
        ``scd.apply_changes`` for the exact latest-wins semantics.
        """

        cfg = dict(
            keys=keys,
            sequence_by=sequence_by,
            stored_as_scd_type=stored_as_scd_type,
            track_history_column_list=track_history_column_list,
            now=now,
            skey=skey,
            apply_as_deletes=apply_as_deletes,
        )

        def fold(src: DataFrame) -> DataFrame:
            return scd.apply_changes(
                None,  # stateless within a run; persistent state via storage layer
                src,
                **cfg,
            )

        self._nodes[target] = Node(
            name=target, fn=fold, deps=[source], kind="table", cdc=cfg
        )

    def streaming_source(self, name: str, table: str) -> None:
        """S8/ST5: a node that reads a catalog table *as a stream*
        (``spark.readStream.table``, ``/root/reference/Gold_Products.py:88,93``).

        In :meth:`run_incremental` the frame flows through downstream view
        transforms as a stream and each run processes only data the node's
        checkpoint hasn't seen; in the batch :meth:`run` it degrades to a
        plain table read so the same pipeline definition works in both
        modes (DLT's continuous vs triggered duality).
        """

        def src(spark: SparkSession) -> DataFrame:
            return spark.readStream.table(table)

        self._nodes[name] = Node(
            name=name, fn=src, deps=[], kind="streaming_source", comment=table
        )

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

    def _eval(self, node: Node, spark: SparkSession, outputs: dict) -> DataFrame:
        params = inspect.signature(node.fn).parameters
        # Non-spark params bind positionally to node.deps (normally the
        # param *names* are the dep names; apply_changes folds differ).
        dep_iter = iter(node.deps)
        kwargs = {
            p: (spark if p == "spark" else outputs[next(dep_iter)])
            for p in params
        }
        return node.fn(**kwargs)

    def run(self, spark: SparkSession) -> RunResult:
        """Execute every node once as a batch, expectations applied in
        declared order.  ``streaming_source`` nodes degrade to plain table
        reads (triggered mode over the full table)."""
        outputs: dict[str, DataFrame] = {}
        reports: dict[str, ex.ExpectationReport] = {}
        for name in self.order():
            node = self._nodes[name]
            if node.kind == "streaming_source":
                df = spark.read.table(node.comment)
            else:
                df = self._eval(node, spark, outputs)
            if node.expect is not None:
                reports[name] = ex.check(df, node.expect)
            if node.expect_all_or_fail is not None:
                df = ex.expect_all_or_fail(df, node.expect_all_or_fail)
            if node.expect_all_or_drop is not None:
                df = ex.expect_all_or_drop(df, node.expect_all_or_drop)
            if node.expect_all_or_quarantine is not None:
                df, quarantined = ex.expect_all_or_quarantine(
                    df, node.expect_all_or_quarantine
                )
                outputs[f"{name}__quarantine"] = quarantined
            outputs[name] = df
        return RunResult(outputs=outputs, expectation_reports=reports)

    def run_incremental(
        self,
        spark: SparkSession,
        checkpoint_root: str,
        database: str,
    ) -> RunResult:
        """Incremental (streaming) execution — DLT's triggered pipeline mode.

        ``streaming_source`` frames flow through ``view`` transforms as
        streams; each materialization point consumes only data its
        checkpoint (``<checkpoint_root>/<node>``) hasn't seen:

        * ``table`` nodes with a streaming frame append to the catalog table
          ``<database>.<node>`` via ``writeStream.toTable`` +
          ``availableNow`` (S2/ST2-ST4 over a table sink).
        * ``apply_changes`` nodes fold each micro-batch into the persistent
          SCD state at ``<database>.<node>`` with ``foreachBatch`` — the CDC
          feed is read *incrementally* (``Gold_Products.py:88-105``
          end-to-end), initial-load vs merge decided per batch (M4).

        Expectations: ``expect_all_or_drop`` rules are Catalyst filters and
        apply to the stream itself (rows never reach the sink — DLT drop
        semantics); warn-only ``expect`` and ``expect_all_or_fail`` need an
        aggregate, so on streaming nodes they run against the materialized
        table after the trigger completes.

        Scale notes: state rewrite per micro-batch is a dimension-table
        pattern (dims are ≪ facts); ``localCheckpoint`` breaks lineage so
        the overwrite never reads the files it replaces.  Returns batch
        frames over the materialized tables.
        """
        cat.create_schema(spark, database)
        outputs: dict[str, DataFrame] = {}
        reports: dict[str, ex.ExpectationReport] = {}
        for name in self.order():
            node = self._nodes[name]
            if node.cdc is not None:
                # The CDC fold is a batch merge — on a streaming feed it must
                # run per micro-batch inside foreachBatch, so take the raw
                # upstream frame here instead of evaluating the fold on it.
                df = outputs[node.deps[0]]
                if not df.isStreaming:
                    df = self._eval(node, spark, outputs)
            else:
                df = self._eval(node, spark, outputs)
            if node.expect_all_or_drop is not None:
                df = ex.expect_all_or_drop(df, node.expect_all_or_drop)
            quarantined = None
            if node.expect_all_or_quarantine is not None:
                df, quarantined = ex.expect_all_or_quarantine(
                    df, node.expect_all_or_quarantine
                )
            if not df.isStreaming:
                if node.expect is not None:
                    reports[name] = ex.check(df, node.expect)
                if node.expect_all_or_fail is not None:
                    df = ex.expect_all_or_fail(df, node.expect_all_or_fail)
                if quarantined is not None:
                    outputs[f"{name}__quarantine"] = quarantined
                outputs[name] = df
                continue
            if node.kind in ("view", "streaming_source"):   # streams keep flowing
                if quarantined is not None:
                    outputs[f"{name}__quarantine"] = quarantined
                outputs[name] = df
                continue
            target_tbl = f"{database}.{name}"
            ckpt = os.path.join(checkpoint_root, name)
            if node.cdc is not None:
                cfg = node.cdc

                def fold(batch_df: DataFrame, _bid: int,
                         target_tbl: str = target_tbl, cfg: dict = cfg) -> None:
                    batch_spark = batch_df.sparkSession
                    if cat.table_exists(batch_spark, target_tbl):
                        # the previous fold overwrote the files under this
                        # name — drop the stale listing before reading state
                        batch_spark.catalog.refreshTable(target_tbl)
                        tgt = batch_spark.read.table(target_tbl)
                    else:
                        tgt = None
                    out = scd.apply_changes(tgt, batch_df, **cfg)
                    if tgt is not None:
                        out = out.localCheckpoint(eager=True)
                    out.write.mode("overwrite").format("parquet").saveAsTable(
                        target_tbl
                    )

                q = (
                    df.writeStream.foreachBatch(fold)
                    .trigger(availableNow=True)
                    .option("checkpointLocation", ckpt)
                    .start()
                )
            else:
                q = (
                    df.writeStream.outputMode("append")
                    .trigger(availableNow=True)
                    .option("checkpointLocation", ckpt)
                    .toTable(target_tbl)
                )
            q.awaitTermination()
            if quarantined is not None:
                # the quarantine side output is its own streaming sink with
                # its own checkpoint (offsets advance independently — a
                # quarantined row is delivered exactly once per sink)
                qq = (
                    quarantined.writeStream.outputMode("append")
                    .trigger(availableNow=True)
                    .option("checkpointLocation", f"{ckpt}__quarantine")
                    .toTable(f"{target_tbl}__quarantine")
                )
                qq.awaitTermination()
                spark.catalog.refreshTable(f"{target_tbl}__quarantine")
                outputs[f"{name}__quarantine"] = spark.read.table(
                    f"{target_tbl}__quarantine"
                )
            spark.catalog.refreshTable(target_tbl)
            materialized = spark.read.table(target_tbl)
            if node.expect is not None:
                reports[name] = ex.check(materialized, node.expect)
            if node.expect_all_or_fail is not None:
                materialized = ex.expect_all_or_fail(
                    materialized, node.expect_all_or_fail
                )
            outputs[name] = materialized
        return RunResult(outputs=outputs, expectation_reports=reports)
