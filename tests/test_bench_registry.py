"""Registry/driver drift gate: every registered query is either timed by
bench.py or explicitly excluded with a reason — a new queries() entry that
forgets both fails here instead of silently missing the driver's
BENCH/CORRECTNESS gates (VERDICT r2 found 13 such strays)."""

from __future__ import annotations

import bench

import __spark_entry__ as entry


def test_headline_and_excluded_partition_the_registry():
    # bench partitions the FULL workload registry, including
    # DRIVER_RETIRED lanes: they left the driver's correctness window,
    # not the bench — dropping them from HEADLINE would silently shrink
    # the frozen r7/prev instrument bases.
    from medallion_data_warehouse_on_azure_with_databricks_pyspark_spark import (
        workload,
    )

    registered = set(workload.QUERIES)
    headline = set(bench.HEADLINE)
    excluded = set(bench.EXCLUDED)
    assert len(bench.HEADLINE) == len(headline), "duplicate HEADLINE entries"
    assert not headline & excluded, "a query cannot be both timed and excluded"
    assert headline | excluded == registered, (
        f"drift: missing from bench={sorted(registered - headline - excluded)} "
        f"stale in bench={sorted((headline | excluded) - registered)}"
    )


def test_driver_retired_lanes_keep_their_other_gates():
    """DRIVER_RETIRED (VERDICT r14 ask #2) trades a lane's 50-slot
    correctness-window budget for its dual-SF pytest oracle + a
    driver-rotating indexed twin.  Pin all three legs so retirement can
    never silently become deletion: the lane stays registered with an
    oracle (pytest replays it at both SFs), stays timed-or-excluded in
    bench, is OUT of the driver ordering, and its twin is IN."""
    from medallion_data_warehouse_on_azure_with_databricks_pyspark_spark import (
        workload,
    )

    assert workload.DRIVER_RETIRED == {
        "emb_sq8_topk", "emb_ivfbq_topk", "emb_ivfsq8_topk",
        "emb_pq_adc_topk", "emb_matryoshka_topk",
    }, "retirement set changed — re-audit the twin mapping below"
    twins = {
        "emb_sq8_topk": "emb_ivfsq8_indexed_topk",
        "emb_ivfbq_topk": "emb_ivfbq_indexed_topk",
        "emb_ivfsq8_topk": "emb_ivfsq8_indexed_topk",
        "emb_pq_adc_topk": "emb_ivfpq_indexed_topk",
        "emb_matryoshka_topk": "emb_matryoshka_indexed_topk",
    }
    ordered = set(workload.ordered_queries())
    benched = set(bench.HEADLINE) | set(bench.EXCLUDED)
    for lane, twin in twins.items():
        assert lane in workload.QUERIES, lane
        assert lane in workload.ORACLE, f"{lane} lost its pytest oracle"
        assert lane in benched, f"{lane} dropped from bench partition"
        assert lane not in ordered, f"{lane} still in the driver ordering"
        assert twin in ordered, f"twin {twin} missing from driver ordering"


def test_summary_line_is_constant_size():
    """The driver parses only a bounded (~2000-char) stdout tail; the r3 and
    r4 bench gates were both lost to the final line outgrowing it.  Pin the
    summary line small at ANY query count, and pin that the detail line can
    never be mistaken for it."""
    timings = {f"query_with_a_rather_long_name_{i:04d}": 123.4567 for i in range(500)}
    detail, summary = bench.render_output(timings, sf=0.1)
    # r17: +~25 bytes for the constant common_r7_cpu field (VERDICT r16
    # ask #3); the invariant is CONSTANT-size vs query count, and the
    # driver tail window is ~2000 chars — 260 keeps 8x headroom
    assert len(summary) < 260, f"summary line grew to {len(summary)} bytes"
    assert summary.startswith('{"metric"')
    assert '"queries"' not in summary
    assert not detail.startswith('{"metric"')


def test_bench_surfaces_lane_errors_without_losing_the_metric():
    """r16: a lane that raises mid-bench must not lose the ROUND's
    metric — the error lands in the detail line's "errors" map and the
    constant-size summary carries only the count."""
    timings = {"q1": 1.0, "q2": 2.0}
    errors = {"q3": "AssertionError: wrong rewrite scope"}
    detail, summary = bench.render_output(timings, sf=0.1, errors=errors)
    import json as _json

    d, s = _json.loads(detail), _json.loads(summary)
    assert d["errors"] == errors
    assert s["n_errors"] == 1 and s["value"] == 3.0
    assert len(summary) < 250
    # the clean path stays clean: no errors key, n_errors 0
    d2, s2 = map(_json.loads, bench.render_output(timings, sf=0.1))
    assert "errors" not in d2 and s2["n_errors"] == 0


def test_every_query_has_oracle_or_documented_weak_check():
    """Each queries() entry needs an oracle_sql() row for the driver's
    hash gate; the rows-only set is pinned so additions are deliberate."""
    registered = set(entry.queries())
    oracles = set(entry.oracle_sql())
    assert oracles <= registered
    rows_only = registered - oracles
    assert rows_only == {
        # engine-specific sketches: no ANSI-SQL oracle, each has a
        # behavioral pytest instead (see VERDICT r2 adjudication).
        # emb_ivf_kmeans_topk left this set in r8: its one-round
        # fixed-point training is closed-form and the oracle replays it.
        "doc_simhash_pairs",
        "events_approx_distinct",
        "events_approx_quantiles",
        # real byte-level BPE: not SQL-expressible; exact counts pinned by
        # tests/test_llmops.py against an independent reference encoder
        "doc_bpe_token_counts",
        # r9: iterative BPE TRAINING (merge k+1 depends on merge k) is
        # not SQL-expressible; tests/test_tokenizer.py pins the
        # distributed trainer EXACTLY equal to the single-node trainer
        "doc_bpe_trained_tokens",
    }, f"unexpected rows-only queries: {sorted(rows_only)}"


#: Lanes whose code path changes in the CURRENT round (rotation rule 2:
#: a changed lane always gets a fresh driver hash regardless of
#: staleness).  Maintained alongside CORRECTNESS_PRIORITY each round.
CHANGED_THIS_ROUND = {
    # r19 (VERDICT r18 asks #3/#4/#5/#7/#8 + r18 ADVICE): grouped_topk's
    # double exchange is fused and the SQ8/BQ stat memo caches removed —
    # every similarity-family lane rides the changed code (grouped_topk
    # merges every ANN shortlist; mmr's checkpoint goes back eager;
    # _spread drops its .rdd probe); the multi-commit maintenance lanes
    # gain overlapped independent jobs; doc_sentences_udtf tries the
    # Arrow UDTF path.
    "emb_cosine_topk", "emb_sq8_indexed_topk", "emb_lsh_topk",
    "emb_lsh_multitable_topk", "emb_ivf_topk", "emb_ivf_indexed_topk",
    "emb_lsh_indexed_topk", "emb_cosine_dedup_pairs", "emb_semantic_dedup",
    "emb_top_pc_projection", "emb_chunk_mean_pool", "emb_ivfpq_topk",
    "emb_ivfpq_residual_topk", "emb_ivfpq_indexed_topk",
    "emb_ivfpq_stream_topk", "emb_pq_indexed_topk",
    "emb_ivfsq8_indexed_topk", "emb_matryoshka_ivf_topk",
    "emb_ivfsq8_stream_topk", "emb_matryoshka_indexed_topk",
    "emb_ivfbq_indexed_topk", "emb_mmr_diversified_topk",
    "emb_mmr_ivf_topk", "emb_semantic_decontamination",
    "emb_ivf_recall_report", "emb_ivf_drift_report",
    "emb_int8_quantize_error", "emb_ivf_kmeans_topk",
    "part_matview_incremental", "events_recluster_incremental_scan",
    "events_recluster_hilbert_scan", "events_recluster_zorder_scan",
    "docs_recluster_sorted_scan", "scd2_part_dim_deletes",
    "doc_sentences_udtf",
}

#: Fresh lanes the VERDICT explicitly asked to front this round
#: despite a recent hash row.  NOT squatters: the squatter test excuses
#: exactly this named set, and the set is re-derived from the verdict
#: each round (empty when no ask stands).  r19: VERDICT r18 ask #1 —
#: the r18 similarity/dedup/merge_dv rewrite landed with ZERO emb lanes
#: in the r18 oracle window, so the rewritten lanes must front r19
#: regardless of their (pre-rewrite) r17 hash rows.
VERDICT_FRONTED = {
    "doc_dedup_keep_best", "doc_dedup_representatives",
    "doc_leakage_safe_splits", "part_merge_dv_scan",
}

_CHANGED_R16 = {
    # r16 (VERDICT r15 asks #3/#4/#6 + all five ADVICE items):
    # replace_files/append_versioned grow the sidecars-pending recovery
    # marker and partition-layout enforcement — every lane that commits
    # file subsets rides them; optimize_compact_incremental packs per
    # partition (per-partition byte targets + no-op guard); the
    # incremental recluster selector refuses non-numeric clustering
    # columns and reports escalation telemetry through the maintenance
    # sweep; the bloom maintenance hooks guard the zero-row sidecar; the
    # Hilbert LUT memo re-keys by applicationId.
    "events_recluster_incremental_scan", "events_recluster_zorder_scan",
    "events_recluster_hilbert_scan", "part_optimize_compacted_scan",
    "part_bloom_skipping_scan", "part_replace_partitions",
    # r16: the semantic-clusters cache re-keys by (applicationId,
    # sf_dir) so a session restart can never serve a dead-JVM frame.
    "emb_semantic_dedup",
    # NEW lane (r16): string-keyed linear clustering (curve="sorted")
    # through the incremental maintenance loop.
    "docs_recluster_sorted_scan",
    # r16 late: DV-merge publish drops standing skipping sidecars
    # (incomplete-manifest hazard) — the merge-on-read lane rides it.
    "part_merge_dv_scan",
}  # r16 record, superseded by CHANGED_THIS_ROUND above


def _skip_if_priority_window_consumed(latest):
    """VERDICT r12 'What's wrong' #1: once the driver has produced the
    CORRECTNESS artifacts for the round this priority list was tuned for,
    the window is *by design* stale — the next round's first commit must
    rotate it.  Skip with a message that names the required action instead
    of failing as if the engine regressed (any unrelated work committed
    before the rotation would otherwise ship on a red suite)."""
    import pytest

    from medallion_data_warehouse_on_azure_with_databricks_pyspark_spark import (
        workload,
    )

    newest = max(latest.values())
    if newest >= workload.CORRECTNESS_PRIORITY_ROUND:
        pytest.skip(
            f"CORRECTNESS_PRIORITY is tuned for round "
            f"{workload.CORRECTNESS_PRIORITY_ROUND} but driver artifacts "
            f"for r{newest} exist — rotate CORRECTNESS_PRIORITY (and bump "
            f"CORRECTNESS_PRIORITY_ROUND) as the FIRST commit of round "
            f"{newest + 1}"
        )


def _latest_driver_rounds():
    """lane -> newest round with ANY driver CORRECTNESS row (hash rows
    for oracle lanes, rows-only rows for the no-oracle set)."""
    import glob
    import json
    import os
    import re

    root = os.path.join(os.path.dirname(__file__), "..")
    latest = {}
    for f in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"r(\d+)", os.path.basename(f)).group(1))
        for lane, row in json.load(open(f)).items():
            ok = row.get("hash_match") or row.get("err") == "no_oracle"
            if ok:
                latest[lane] = max(latest.get(lane, 0), rnd)
    return latest


def test_ordered_queries_serves_priority_window():
    """The driver contract serves CORRECTNESS_PRIORITY order: full registry
    coverage, and the 50-slot driver window holds only lanes that NEED a
    fresh hash row — the stalest tier plus this round's changed/new code
    paths (rotation rules 1 and 2) — never a freshly-checked lane
    squatting a slot."""
    from medallion_data_warehouse_on_azure_with_databricks_pyspark_spark import (
        workload,
    )

    ordered = workload.ordered_queries()
    assert set(ordered) == set(workload.QUERIES) - workload.DRIVER_RETIRED
    window = list(ordered)[:50]
    latest = _latest_driver_rounds()
    _skip_if_priority_window_consumed(latest)
    newest_round = max(latest.values())
    import __spark_entry__ as entry_mod

    oracles = set(entry_mod.oracle_sql())
    squatters = [
        q for q in window
        if q not in CHANGED_THIS_ROUND
        and q not in VERDICT_FRONTED  # the verdict's own fronting ask
        and q in oracles  # no-oracle lanes may front on VERDICT's ask
        # (r15 ask #5): their rows-only row is the only driver evidence
        # they can ever get, so "freshly hashed" never applies to them
        and latest.get(q, 0) > newest_round - 2
    ]
    assert squatters == [], (
        f"freshly-checked lanes occupy window slots while staler lanes "
        f"wait: {squatters}"
    )


def test_rotation_policy_no_lane_stale_beyond_promise():
    """VERDICT r11 ask #8 / restated r15 (VERDICT r14 ask #2): enforce
    the rotation policy's promise — 'no driver lane goes more than THREE
    rounds without a driver-side row' (workload.py rotation comment; the
    registry outgrew the original 2-round wording at ~145 lanes, and
    this test always enforced the 3-round bound).  Any ORACLE lane whose
    newest driver row would be 4+ rounds old after this round's run must
    sit inside the 50-slot window; a lane never checked at all (new this
    round) must too.  The 5 no-oracle lanes get one extra window of
    grace (positions <= 100): their driver evidence is rows-only while
    their exact oracle is pytest, so hash-bearing lanes outrank them for
    slots when the stale tier exactly fills a window."""
    import __spark_entry__ as entry_mod
    from medallion_data_warehouse_on_azure_with_databricks_pyspark_spark import (
        workload,
    )

    ordered = list(workload.ordered_queries())
    pos = {q: i for i, q in enumerate(ordered)}
    oracles = set(entry_mod.oracle_sql())
    latest = _latest_driver_rounds()
    _skip_if_priority_window_consumed(latest)
    newest_round = max(latest.values())
    overdue = []
    for lane in ordered:
        last = latest.get(lane)
        if last is not None and last >= newest_round - 2:
            continue  # within the two-rounds-without-a-row promise
        budget = 50 if lane in oracles and last is not None else 100
        if lane in oracles and last is None:
            budget = 50  # brand-new lane: rule 2, front window
        if pos[lane] >= budget:
            overdue.append((lane, last, pos[lane]))
    assert overdue == [], (
        f"lanes stale beyond the rotation promise and outside their "
        f"window: {overdue}"
    )


def test_sibling_module_is_safe_import_entry_point():
    """Importing a workload sibling FIRST (before workload) must not trip
    the registry drift check — the priority ordering is applied at
    ordered_queries() call time, never at import time (the circular
    partial-import would otherwise see an incomplete registry)."""
    import subprocess
    import sys

    code = (
        "import medallion_data_warehouse_on_azure_with_databricks_pyspark_spark.workload_llm as m; "
        "from medallion_data_warehouse_on_azure_with_databricks_pyspark_spark import workload; "
        "assert 'doc_winnow_overlap_pairs' in workload.ordered_queries()"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
