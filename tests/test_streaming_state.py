"""State-store provider A/B (SCALE.md "State-store A/B"): the provider is
a pure perf knob — HDFS-backed heap and RocksDB must produce the
identical session set — and the SPARK_GRAFT_STATE_STORE env flag must
actually select the provider on the registered query."""

from __future__ import annotations

import os
from unittest import mock

from medallion_data_warehouse_on_azure_with_databricks_pyspark_spark import (
    workload,
)
from medallion_data_warehouse_on_azure_with_databricks_pyspark_spark.streaming import (
    stateful,
)


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
