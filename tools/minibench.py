"""Bench-protocol (best-of-2, same warm session) timing for a SUBSET of
headline lanes — the optimization loop's fast A/B instrument.  Compares
apples-to-apples with a full bench detail file when both ran on a quiet
box.

Usage::

    python tools/minibench.py lane1 lane2 ...
    python tools/minibench.py --prefix emb_          # every emb_* headline lane
    python tools/minibench.py --prefix emb_ --base /tmp/bench_detail_baseline.json
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from medallion_data_warehouse_on_azure_with_databricks_pyspark_spark import (  # noqa: E402
    session,
    workload,
)


def main() -> None:
    args = sys.argv[1:]
    base = None
    if "--base" in args:
        i = args.index("--base")
        with open(args[i + 1]) as fh:
            base = json.load(fh)["queries"]
        args = args[:i] + args[i + 2:]
    if args and args[0] == "--prefix":
        lanes = [n for n in bench.HEADLINE if n.startswith(args[1])]
    else:
        lanes = args
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    spark = session.get_spark(app_name="minibench")
    spark.sparkContext.setLogLevel("ERROR")
    workload.QUERIES[bench.HEADLINE[0]](spark, sf_dir).count()

    timings = {}
    for name in lanes:
        fn = workload.QUERIES[name]
        runs = []
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            runs.append(time.perf_counter() - t0)
        if max(runs) > 1.5 * min(runs):
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            runs.append(time.perf_counter() - t0)
        timings[name] = round(min(runs), 4)
        try:
            spark.catalog.clearCache()
            for tbl in spark.catalog.listTables():
                if tbl.isTemporary:
                    spark.catalog.dropTempView(tbl.name)
        except Exception:
            pass
        if base is not None:
            b = base.get(name)
            ratio = f"{timings[name] / b:5.2f}x" if b else "    -"
            print(f"{name:42s} {timings[name]:8.3f}  base={b or 0:8.3f} {ratio}",
                  flush=True)
        else:
            print(f"{name:42s} {timings[name]:8.3f}", flush=True)
    total = round(sum(timings.values()), 4)
    print(json.dumps({"total": total, "n": len(timings), "queries": timings}))
    if base is not None:
        bt = round(sum(v for k, v in base.items() if k in timings), 4)
        print(f"subset total {total} vs base {bt} = {total / bt:.3f}x")
    spark.stop()


if __name__ == "__main__":
    main()
