"""Generate the next round's CORRECTNESS_PRIORITY ordering.

Every round's FIRST commit must rotate the 50-slot driver correctness
window (rotation rules in workload.py).  This script makes that commit
mechanical:

    python tools/rotate_priority.py --round 14 \
        --changed part_dv_delete_scan,events_stream_matview_ingest

It prints, as copy-pasteable Python source:
  * the window: stale oracle lanes (3+ rounds old once this round's
    artifacts land) first, then the --changed lanes not already stale,
    padded/truncated against the 50-slot budget with loud warnings;
  * the no-oracle lanes (budget 100);
  * the remaining tiers, freshest last.

It is a GENERATOR, not an authority: read the output, sanity-check the
geometry warnings, paste into workload.py, bump
CORRECTNESS_PRIORITY_ROUND, and update CHANGED_THIS_ROUND in
tests/test_bench_registry.py — the guard tests are the enforcement.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys


def latest_driver_rounds(root: str) -> dict[str, int]:
    latest: dict[str, int] = {}
    for f in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"r(\d+)", os.path.basename(f)).group(1))
        for lane, row in json.load(open(f)).items():
            ok = row.get("hash_match") or row.get("err") == "no_oracle"
            if ok:
                latest[lane] = max(latest.get(lane, 0), rnd)
    return latest


def fmt(lanes: list[str]) -> str:
    lines, cur = [], "    "
    for lane in lanes:
        tok = f'"{lane}",'
        if len(cur) + len(tok) + 1 > 76:
            lines.append(cur.rstrip())
            cur = "    "
        cur += tok + " "
    lines.append(cur.rstrip())
    return "\n".join(lines)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, required=True,
                    help="the round this window is tuned for")
    ap.add_argument("--changed", default="",
                    help="comma-separated lanes whose code changes this round")
    args = ap.parse_args()

    root = os.path.join(os.path.dirname(__file__), "..")
    sys.path.insert(0, root)
    import __spark_entry__ as entry

    registered = list(entry.queries())
    oracles = set(entry.oracle_sql())
    latest = latest_driver_rounds(root)
    newest = max(latest.values())
    changed = [c for c in args.changed.split(",") if c]
    unknown = sorted(set(changed) - set(registered))
    if unknown:
        print(f"ERROR: --changed lanes not registered: {unknown}")
        return 1

    # MUST-window = would breach the 3-round promise (restated r15,
    # VERDICT r14 ask #2) if skipped this round: last row 4+ rounds old
    # after THIS round's run.  registered comes from entry.queries(), so
    # DRIVER_RETIRED lanes never appear here.
    must_oracle = sorted(
        q for q in registered
        if q in oracles and latest.get(q, 0) <= args.round - 4
    )
    # next-stalest oracle lanes fill remaining slots so the steady-state
    # cadence stays ahead of the promise, never at its edge
    fill_oracle = sorted(
        (q for q in registered
         if q in oracles and q not in must_oracle
         and latest.get(q, 0) <= args.round - 3),
        key=lambda q: latest.get(q, 0),
    )
    stale_oracle = must_oracle + fill_oracle
    no_oracle = sorted(set(registered) - oracles)
    # the no-oracle grace is ONE extra round, not indefinite: r13 proved
    # the driver consumes exactly the first 50 entries, so a rows-only
    # lane past promise+1 must sit INSIDE the window
    overdue_no_oracle = [
        q for q in no_oracle if latest.get(q, 0) <= args.round - 5
    ]
    changed_fresh = [c for c in changed if c not in stale_oracle]
    must = (
        overdue_no_oracle
        + must_oracle
        + [c for c in changed_fresh if c in oracles]
    )
    if len(must) > 50:
        overflow = len(must) - 50
        print(f"WARNING: {len(must)} MUST-window lanes for 50 slots — "
              f"hand-pick {overflow} lanes to defer to positions 51+ "
              "(lowest information loss: lanes whose composed rungs hold "
              "fresher evidence), note them in the priority comment, "
              "front them NEXT round, and consider DRIVER_RETIRED for "
              "lanes with an indexed twin + dual-SF pytest oracle")
    window = must + [q for q in fill_oracle if q not in must]
    window = window[:50]
    pad = [q for q in no_oracle if q not in window][: max(0, 50 - len(window))]
    window += pad
    rest_no_oracle = [q for q in no_oracle if q not in window]
    placed = set(window) | set(rest_no_oracle)
    tiers = sorted({latest.get(q, 0) for q in registered if q not in placed})
    print(f"# window tuned for round {args.round} "
          f"(newest artifacts on disk: r{newest})")
    print(f"# --- window ({len(window)}) ---")
    print(fmt(window))
    if rest_no_oracle:
        print(f"# --- no-oracle grace tier ({len(rest_no_oracle)}) ---")
        print(fmt(rest_no_oracle))
    for t in tiers:
        tier = sorted(
            q for q in registered
            if q not in placed and latest.get(q, 0) == t
        )
        placed |= set(tier)
        print(f"# --- last hash row r{t} ({len(tier)}) ---")
        print(fmt(tier))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
