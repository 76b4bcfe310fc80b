"""Run one maintenance sweep from the command line — the operational
face of ``plans/maintenance.py`` (a cron job or CI step calls this; the
module API is for embedding in a driver program).

    python tools/maintain.py \
        --index /data/idx/minhash --index /data/idx/ivfpq \
        --dv /data/tables/events \
        --table /data/tables/part \
        --cluster /data/tables/events:event_id,ts_ns \
        [--quiesced] [--dry-run]

Prints one JSON line per swept artifact: kind, path, the polled health,
the decided action, and the actuator's result or error.  ``--dry-run``
polls and decides but dispatches nothing (what WOULD the sweep do).
Exit code 1 if any actuator errored, else 0.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", action="append", default=[],
                    help="ANN/dedup index artifact path (repeatable)")
    ap.add_argument("--dv", action="append", default=[],
                    help="deletion-vector table path (repeatable)")
    ap.add_argument("--table", action="append", default=[],
                    help="versioned table path, swept for retention")
    ap.add_argument("--cluster", action="append", default=[],
                    help="versioned table layout spec: "
                         "path:col_a[,col_b...][:curve] with curve morton "
                         "(default, 2+ numeric dims), hilbert (2-D "
                         "numeric), or sorted (linear, 1+ cols, any "
                         "orderable type incl. strings)")
    ap.add_argument("--declare", action="append", default=[],
                    help="declare clustering on a versioned table "
                         "(persisted CLUSTER BY: path:col_a[,col_b...]"
                         "[:curve], curve default sorted) before the "
                         "sweep — afterwards --table alone keeps the "
                         "layout healthy; path: with no columns drops "
                         "the declaration")
    ap.add_argument("--incremental", action="store_true",
                    help="recluster strategy: rewrite only offender "
                         "files (liquid-clustering shape, cost ~ decay) "
                         "instead of the full snapshot; structural decay "
                         "still escalates to the full rewrite")
    ap.add_argument("--compact-target", type=int, default=None,
                    metavar="BYTES",
                    help="enable the small-file compaction leg on "
                         "--table entries: bin-pack (through the "
                         "declared clustering curve, if any) files "
                         "below this size; in --dry-run, prints the "
                         "packable-debt plan instead of dispatching")
    ap.add_argument("--quiesced", action="store_true",
                    help="assert no writers are live: enables recovery "
                         "of crashed claims (see recover_dv_merge's "
                         "live-writer contract)")
    ap.add_argument("--dry-run", action="store_true",
                    help="poll + decide only; dispatch nothing")
    ap.add_argument("--master", default=None,
                    help="spark master override (default: session default)")
    args = ap.parse_args()

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from medallion_data_warehouse_on_azure_with_databricks_pyspark_spark import (
        session,
    )
    from medallion_data_warehouse_on_azure_with_databricks_pyspark_spark.plans import (
        maintenance as M,
    )

    cluster_specs = []
    for spec in args.cluster:
        rest, curve = spec, None
        head, _, tail = spec.rpartition(":")
        if head and tail in ("morton", "hilbert", "sorted"):
            rest, curve = head, tail
        path, _, cols = rest.rpartition(":")
        parts = tuple(c for c in cols.split(",") if c)
        min_cols = 1 if curve == "sorted" else 2
        if not (path and len(parts) >= min_cols):
            ap.error(
                f"--cluster wants path:col_a[,col_b...][:curve], got {spec!r}"
            )
        if curve == "hilbert" and len(parts) != 2:
            ap.error(f"hilbert clustering is 2-D, got {spec!r}")
        cluster_specs.append(
            (path, parts) if curve is None else (path, parts, curve)
        )

    declares = []
    for spec in args.declare:
        rest, curve = spec, "sorted"
        head, _, tail = spec.rpartition(":")
        if head and tail in ("morton", "hilbert", "sorted"):
            rest, curve = head, tail
        path, sep, cols = rest.rpartition(":")
        if not (path and sep):
            ap.error(f"--declare wants path:col_a[,col_b...][:curve], "
                     f"got {spec!r}")
        declares.append((path, [c for c in cols.split(",") if c], curve))

    spark = session.get_spark(
        app_name="medallion-maintain",
        **({"master": args.master} if args.master else {}),
    )
    spark.sparkContext.setLogLevel("ERROR")

    if declares:
        from medallion_data_warehouse_on_azure_with_databricks_pyspark_spark.sources import (
            versioned as _v,
        )

        for path, cols, curve in declares:
            _v.set_clustering(spark, path, cols, curve=curve)
            print(json.dumps({"kind": "declare", "path": path,
                              "clustering": _v.clustering_of(path)}))

    if args.dry_run:
        from medallion_data_warehouse_on_azure_with_databricks_pyspark_spark.functions import (
            layout,
        )
        from medallion_data_warehouse_on_azure_with_databricks_pyspark_spark.operators import (
            index_maintenance as im,
        )
        from medallion_data_warehouse_on_azure_with_databricks_pyspark_spark.sources import (
            deletion_vectors as dv,
            versioned,
        )

        report = []
        for p in args.index:
            h = im.index_health(spark, p)
            report.append({"kind": "index", "path": p, "health": h,
                           "action": M.decide_index(h)})
        for p in args.dv:
            h = dv.dv_health(spark, p)
            report.append({"kind": "dv", "path": p, "health": h,
                           "action": M.decide_dv(h, assume_quiesced=args.quiesced)})
        # mirror run_maintenance: --table entries with DECLARED
        # clustering get the cluster poll in the dry-run too
        eff_specs = list(cluster_specs)
        explicit = {s[0] for s in eff_specs}
        for p in args.table:
            dec = versioned.clustering_of(p)
            if dec and p not in explicit:
                eff_specs.append(
                    (p, tuple(dec["cols"]), dec.get("curve", "sorted"))
                )
        for spec in eff_specs:
            p, cols = spec[0], spec[1]
            h = layout.cluster_health(spark, p, list(cols),
                                      files=M._live_files(spark, p))
            report.append({"kind": "cluster", "path": p, "health": h,
                           "action": M.decide_cluster(h)})
        for p in args.table:
            d = versioned.table_detail(p)
            action = M.decide_table(d, assume_quiesced=args.quiesced)
            row = {"kind": "table", "path": p, "action": action}
            # the per-version file-reference maps feed decide_table but
            # would bloat the one-line report unboundedly — summarize
            d.pop("snapshot_refs", None)
            d.pop("data_file_bytes", None)
            row["health"] = d
            # price the decisions (r17): what a vacuum would actually
            # reclaim, and what a compaction would actually rewrite.
            # keep_last comes from the policy so the dry run and
            # decide_table always price the same drop set (ADVICE r17
            # #4 — they agreed only because both defaulted to 2).
            plan = versioned.vacuum(
                p, dry_run=True,
                keep_last=M.MaintenancePolicy().vacuum_keep_last,
            )
            row["reclaim"] = {"versions": plan["versions"],
                              "files": len(plan["files"]),
                              "bytes": plan["bytes"],
                              "log_files": len(plan.get("log_files", ())),
                              "log_bytes": plan.get("log_bytes", 0)}
            if args.compact_target:
                cplan, live = versioned.compaction_plan(
                    p, args.compact_target
                )
                row["compaction"] = {
                    "branches": len(cplan),
                    "files": sum(len(f) for f, _ in cplan),
                    "live_files": len(live),
                }
                # same dispatch rule as the real sweep, including the
                # min-files floor — a dry run must predict, not flatter
                if (
                    action is None
                    and cplan
                    and row["compaction"]["files"]
                    >= M.MaintenancePolicy().table_compact_min_files
                ):
                    row["action"] = "compact"
            report.append(row)
    else:
        policy = M.MaintenancePolicy(
            cluster_strategy="incremental" if args.incremental else "full",
            table_compact_target_bytes=args.compact_target,
        )
        report = M.run_maintenance(
            spark,
            index_paths=args.index,
            dv_paths=args.dv,
            cluster_specs=cluster_specs,
            table_paths=args.table,
            policy=policy,
            assume_quiesced=args.quiesced,
        )

    failed = False
    for row in report:
        failed = failed or "error" in row
        print(json.dumps(row, default=str))
    spark.stop()
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
