"""Registry/driver drift gate: every registered query is either timed by
bench.py or explicitly excluded with a reason — a new queries() entry that
forgets both fails here instead of silently missing the driver's
BENCH/CORRECTNESS gates (VERDICT r2 found 13 such strays)."""

from __future__ import annotations

import bench

import __spark_entry__ as entry


def test_headline_and_excluded_partition_the_registry():
    registered = set(entry.queries())
    headline = set(bench.HEADLINE)
    excluded = set(bench.EXCLUDED)
    assert len(bench.HEADLINE) == len(headline), "duplicate HEADLINE entries"
    assert not headline & excluded, "a query cannot be both timed and excluded"
    assert headline | excluded == registered, (
        f"drift: missing from bench={sorted(registered - headline - excluded)} "
        f"stale in bench={sorted((headline | excluded) - registered)}"
    )


def test_summary_line_is_constant_size():
    """The driver parses only a bounded (~2000-char) stdout tail; the r3 and
    r4 bench gates were both lost to the final line outgrowing it.  Pin the
    summary line small at ANY query count, and pin that the detail line can
    never be mistaken for it."""
    timings = {f"query_with_a_rather_long_name_{i:04d}": 123.4567 for i in range(500)}
    detail, summary = bench.render_output(timings, sf=0.1)
    assert len(summary) < 200, f"summary line grew to {len(summary)} bytes"
    assert summary.startswith('{"metric"')
    assert '"queries"' not in summary
    assert not detail.startswith('{"metric"')


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


def test_ordered_queries_serves_priority_window():
    """The driver contract serves CORRECTNESS_PRIORITY order: full registry
    coverage, and this round's new/changed queries inside the 50-entry
    driver window."""
    from medallion_data_warehouse_on_azure_with_databricks_pyspark_spark import (
        workload,
    )

    ordered = workload.ordered_queries()
    assert set(ordered) == set(workload.QUERIES)
    window = list(ordered)[:50]
    # round 11 (judge ask #5): every window slot is a lane whose last
    # driver hash row is <= r8 — the r10-checked lanes all rotate out.
    # Front: this round's new lanes (rule 2, never checked).
    assert window[:19] == [
        "emb_mmr_diversified_topk", "emb_mmr_ivf_topk",
        "doc_dedup_keep_best", "doc_temperature_mixture",
        "emb_semantic_decontamination", "events_rolling_anomaly",
        "part_replace_partitions", "events_stream_partition_overwrite",
        "emb_ivf_recall_report", "doc_curation_pipeline",
        "part_optimize_partitions_scan", "events_stream_anomaly_ingest",
        "doc_token_budget_epochs",
        "emb_ivfbq_topk", "emb_ivfbq_indexed_topk",
        "emb_ivfsq8_topk", "emb_ivfsq8_indexed_topk",
        "emb_matryoshka_ivf_topk", "events_stream_matview_ingest",
    ]
    import json
    import os

    r10_path = os.path.join(os.path.dirname(__file__), "..",
                            "CORRECTNESS_r10.json")
    r10_checked = set(json.load(open(r10_path)))
    stale_violations = [q for q in window if q in r10_checked]
    assert stale_violations == [], stale_violations


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
