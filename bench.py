"""Benchmark harness: runs the engine's headline queries and prints ONE JSON
line ``{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...},
"sf": ...}``.

Data dir: ``$SPARK_GRAFT_SF_DIR`` (default ``/root/testdata/sf0.1``);
parallelism: ``local[$SPARK_GRAFT_CPUS]`` (default 32).

Each query is forced with a cheap terminal action (``count`` on the final
plan) so timings cover scan → shuffle → result without driver-side collect
overhead dominating.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from medallion_data_warehouse_on_azure_with_databricks_pyspark_spark import (  # noqa: E402
    session,
    workload,
)

#: Queries timed for the headline metric.  Updated as operators land.
HEADLINE = [
    "customer_segment_count",
    "customer_filter_segment",
    "part_type_token_count",
    "customer_change_hash",
    "orders_year_windows",
    "orders_duplicate_custkeys",
    "lineitem_pricing_summary",
    "fact_enrichment_join",
    "part_discount_udf",
    "part_brand_upper_udf",
    "scd1_customer_dim",
    "scd2_part_dim",
    "order_fact_upsert",
    "dlt_part_pipeline",
    "events_hourly_windows",
    "events_sliding_windows",
    "events_session_windows",
    "events_stateful_sessions",
    "lineitem_skew_salted_agg",
    "events_json_props",
    "orders_priority_rollup",
    "customer_set_ops",
    "orders_top20",
    "part_distinct_aggs",
    "doc_token_counts",
    "doc_text_stats",
    "doc_language_id",
    "doc_exact_dedup",
    "doc_minhash_dedup_pairs",
    "doc_dedup_representatives",
    "emb_cosine_topk",
    "emb_lsh_topk",
    "emb_ivf_topk",
    "emb_cosine_dedup_pairs",
    "multimodal_features",
    "events_asof_join",
    "events_range_join_agg",
    "doc_repetition_stats",
    "doc_scrub_pii",
    "doc_bm25_topk",
    "orders_price_quantiles",
    "emb_int8_quantize_error",
    "orders_status_priority_cube",
    "orders_analytic_windows",
    "customer_without_orders",
    "part_string_functions",
    "doc_chunks",
    "doc_mixture_splits",
    "doc_token_packing",
    "events_resample_ffill",
    "corpus_vocab_topk",
    "events_daily_rolling",
    "events_variant_props",
    "customer_with_high_value_orders",
    "orders_year_priority_pivot",
    "doc_ngram_jaccard_pairs",
    "doc_simhash_pairs",
    "emb_ivf_kmeans_topk",
    "events_approx_distinct",
    "events_approx_quantiles",
    "doc_bpe_token_counts",
    "docs_zorder_pruned_scan",
    "doc_benchmark_decontamination",
    "doc_cross_corpus_dedup",
]

#: Registered queries deliberately NOT timed in the headline metric, with
#: the reason.  tests/test_bench_registry.py pins HEADLINE ∪ EXCLUDED ==
#: workload.QUERIES so new queries can't silently miss the driver gates.
EXCLUDED = {
    # duplicates of timed queries through a different entry point — timing
    # both would double-count the same plan
    "scd1_customer_dim_sql": "same merge plan as scd1_customer_dim via SQL parser",
    "dlt_part_pipeline_incremental": "superset re-run of dlt_part_pipeline",
    # checkpoint-directory streaming harnesses: wall-clock is dominated by
    # per-run temp-dir setup, already covered by events_stateful_sessions
    "events_stream_ingest": "file-stream harness setup noise; covered by stateful query",
}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    spark = session.get_spark(app_name="medallion-bench")
    # Quiet the JVM: streaming state-store maintenance threads can emit WARNs
    # during shutdown, and anything printed after the JSON line breaks the
    # driver's single-line parse (this lost the r3 bench metric).
    spark.sparkContext.setLogLevel("ERROR")
    # Warm the JVM + parquet footers once so timings measure the engine, not
    # first-touch JIT/class-loading noise.
    workload.QUERIES[HEADLINE[0]](spark, sf_dir).count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = workload.QUERIES[name]
        t0 = time.perf_counter()
        fn(spark, sf_dir).count()
        timings[name] = round(time.perf_counter() - t0, 4)

    # Stop the session FIRST so shutdown-time log lines (state-store
    # maintenance, executor teardown) can't land after the JSON result; the
    # JSON line must be the final stdout the driver sees.
    spark.stop()
    sys.stdout.flush()
    sys.stderr.flush()

    total = round(sum(timings.values()), 4)
    print(json.dumps({
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }))


if __name__ == "__main__":
    main()
