"""State-store provider A/B (SCALE.md "State-store A/B"): the provider is
a pure perf knob — HDFS-backed heap and RocksDB must produce the
identical session set — and the SPARK_GRAFT_STATE_STORE env flag must
actually select the provider on the registered query."""

from __future__ import annotations

import pytest

import os
from unittest import mock

from medallion_data_warehouse_on_azure_with_databricks_pyspark_spark import (
    workload,
)
from medallion_data_warehouse_on_azure_with_databricks_pyspark_spark.streaming import (
    stateful,
)



#: opt-in tier (pytest.ini): state-store provider e2e harness
pytestmark = pytest.mark.slow

def _sessions(spark, sf_dir):
    rows = workload.QUERIES["events_stateful_sessions"](spark, sf_dir).collect()
    return sorted(
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in rows
    )


def test_state_store_providers_agree_and_flag_selects(spark):
    from tests.conftest import SF_DIR

    provider_key = "spark.sql.streaming.stateStore.providerClass"

    # spy on run_to_memory so the test proves the env flag actually routes
    # the provider choice into the streaming harness
    seen: list[str | None] = []
    real = stateful.run_to_memory

    def spy(spark_, stream, ckpt, **kw):
        seen.append(kw.get("state_store_provider"))
        return real(spark_, stream, ckpt, **kw)

    with mock.patch.object(stateful, "run_to_memory", spy):
        with mock.patch.dict(os.environ, {"SPARK_GRAFT_STATE_STORE": "hdfs"}):
            hdfs_rows = _sessions(spark, SF_DIR)
        with mock.patch.dict(os.environ, {"SPARK_GRAFT_STATE_STORE": "rocksdb"}):
            rocksdb_rows = _sessions(spark, SF_DIR)
    assert seen == [stateful.HDFS_STATE_STORE, stateful.ROCKSDB_STATE_STORE]
    assert hdfs_rows == rocksdb_rows and len(hdfs_rows) > 0

    # default (no flag) matches both
    env = {k: v for k, v in os.environ.items() if k != "SPARK_GRAFT_STATE_STORE"}
    with mock.patch.dict(os.environ, env, clear=True):
        assert _sessions(spark, SF_DIR) == hdfs_rows

    # conf is restored after each run — no provider leakage across queries
    assert (
        spark.conf.get(provider_key, None) is None
        or "rocksdb" not in str(spark.conf.get(provider_key)).lower()
    )


def test_rolling_anomaly_stream_state_spans_batches(spark, tmp_path):
    """A spike arriving in batch 2 must be judged against baseline rows
    that arrived in batch 1 — the whole point of carrying the window in
    the state store (a per-batch-windowed impl would see n < min_points
    and stay silent)."""
    import datetime as dt
    import os

    from medallion_data_warehouse_on_azure_with_databricks_pyspark_spark.streaming import (
        stateful,
    )

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (i, t0 + dt.timedelta(minutes=i), "m",
         100.0 if i == 12 else 10.0 + (i % 5) / 10.0)
        for i in range(16)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    )
    landing = str(tmp_path / "landing")
    os.makedirs(landing)
    # batch 1: the first 10 rows (all baseline); batch 2: rows 10..15
    # (contains the spike at 12) — explicit mtimes pin the order
    for i, cond in enumerate(("event_id < 10", "event_id >= 10")):
        d = str(tmp_path / f"stage{i}")
        df.filter(cond).coalesce(1).write.parquet(d)
        for f in os.listdir(d):
            if f.endswith(".parquet"):
                dst = os.path.join(landing, f"b{i}_{f}")
                os.rename(os.path.join(d, f), dst)
                os.utime(dst, (1_700_000_000 + i * 60,) * 2)
    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(landing)
    )
    out = stateful.run_to_memory(
        spark,
        stateful.rolling_anomaly_stream(stream, lookback=10, min_points=8),
        str(tmp_path / "ckpt"),
        state_partitions=4,
    ).collect()
    flagged = {r["event_id"] for r in out}
    assert flagged == {12}, flagged
    (row,) = out
    # n_window proves the baseline crossed the batch boundary: the spike
    # has only 2 same-batch predecessors but a 10-row window
    assert row["n_window"] == 10
