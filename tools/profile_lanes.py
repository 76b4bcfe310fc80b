"""Per-lane profiling harness for the optimization rounds (guide §1).

For each requested lane, splits the bench's wall time into its parts so
the optimization target is mechanical, not guessed:

* ``build``   — calling the registered query fn (includes any eager work
  the fn does while CONSTRUCTING the plan: localCheckpoint jobs, index
  builds on first touch, driver-side codebook training).
* ``plan``    — forcing analysis + optimization + physical planning of
  the returned DataFrame (``df._jdf.queryExecution().executedPlan()``),
  no job run.  Large literal trees / deep plans show up here.
* ``exec1/exec2`` — two ``.count()`` runs of a FRESH fn() call each,
  mirroring bench.py's best-of-two protocol.
* ``jobs``    — Spark jobs launched by the second (warm) fn+count cycle,
  via a job group; sequential-small-job lanes are latency-bound locally.

Usage::

    python tools/profile_lanes.py lane [lane ...]
    python tools/profile_lanes.py --top 15        # slowest from BENCH_QUERIES.json

Prints one line per lane plus a JSON tail for scripting.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from medallion_data_warehouse_on_azure_with_databricks_pyspark_spark import (  # noqa: E402
    session,
    workload,
)


def profile_lane(spark, name: str, sf_dir: str) -> dict:
    fn = workload.QUERIES[name]
    sc = spark.sparkContext

    t0 = time.perf_counter()
    df = fn(spark, sf_dir)
    t_build = time.perf_counter() - t0

    t0 = time.perf_counter()
    df._jdf.queryExecution().executedPlan()
    t_plan = time.perf_counter() - t0

    t0 = time.perf_counter()
    df.count()
    t_exec1 = time.perf_counter() - t0

    # warm cycle, job-counted: fresh fn() like bench.py's second run
    sc.setJobGroup(f"profile:{name}", name)
    t0 = time.perf_counter()
    df2 = fn(spark, sf_dir)
    t_build2 = time.perf_counter() - t0
    t0 = time.perf_counter()
    df2.count()
    t_exec2 = time.perf_counter() - t0
    jobs = len(sc.statusTracker().getJobIdsForGroup(f"profile:{name}"))
    sc.setJobGroup("", "")

    return {
        "lane": name,
        "build": round(t_build, 3),
        "plan": round(t_plan, 3),
        "exec1": round(t_exec1, 3),
        "build2": round(t_build2, 3),
        "exec2": round(t_exec2, 3),
        "jobs_warm": jobs,
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    args = sys.argv[1:]
    if args and args[0] == "--top":
        n = int(args[1]) if len(args) > 1 else 15
        here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        with open(os.path.join(here, "BENCH_QUERIES.json")) as fh:
            q = json.load(fh)["queries"]
        lanes = [k for k, _ in sorted(q.items(), key=lambda kv: -kv[1])[:n]]
    else:
        lanes = args
    if not lanes:
        print("usage: profile_lanes.py [--top N | lane ...]", file=sys.stderr)
        sys.exit(2)

    spark = session.get_spark(app_name="lane-profile")
    spark.sparkContext.setLogLevel("ERROR")
    # absorb session cold start so the first profiled lane isn't taxed
    workload.QUERIES["customer_segment_count"](spark, sf_dir).count()

    rows = []
    hdr = f"{'lane':42s} {'build':>7s} {'plan':>7s} {'exec1':>7s} {'build2':>7s} {'exec2':>7s} {'jobs':>5s}"
    print(hdr)
    for name in lanes:
        r = profile_lane(spark, name, sf_dir)
        rows.append(r)
        print(
            f"{r['lane']:42s} {r['build']:7.3f} {r['plan']:7.3f} "
            f"{r['exec1']:7.3f} {r['build2']:7.3f} {r['exec2']:7.3f} "
            f"{r['jobs_warm']:5d}"
        )
        try:
            spark.catalog.clearCache()
        except Exception:
            pass
    print(json.dumps(rows))
    spark.stop()


if __name__ == "__main__":
    main()
