"""Idempotent-writer ledger (txnAppId/txnVersion parity): non-idempotent
counter folds survive foreachBatch replay exactly-once."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from medallion_data_warehouse_on_azure_with_databricks_pyspark_spark.sources import versioned
from medallion_data_warehouse_on_azure_with_databricks_pyspark_spark.streaming import upsert_stream as US

from .conftest import SF_DIR


def _landing(spark, tmp_path) -> tuple[str, object]:
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "event_id", "event_type", "value"
    )
    landing = str(tmp_path / "landing")
    for i in range(3):
        ev.filter(F.col("event_id") % 3 == i).coalesce(1).write.mode(
            "append"
        ).parquet(landing)
    return landing, ev


def test_counter_fold_ingest_end_to_end_with_ledger(spark, tmp_path):
    landing, ev = _landing(spark, tmp_path)
    table = str(tmp_path / "state")
    US.counter_fold_ingest(
        spark, landing, table, str(tmp_path / "ckpt"),
        app_id="counter-stream", schema=ev.schema, now=1_000.0,
    )
    got = {
        r["event_type"]: (r["n_events"], float(r["total_value"]))
        for r in spark.read.parquet(table).collect()
    }
    want = {
        r["event_type"]: (r["n"], float(r["t"]))
        for r in ev.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,4)")).alias("t"),
        ).collect()
    }
    assert got == want
    # three batches = three ledger-stamped commits
    hist = versioned.history(table)
    assert [e["operation"] for e in hist] == ["STREAM_FOLD"] * 3
    assert versioned.last_txn_version(table, "counter-stream") == 2
    assert versioned.last_txn_version(table, "other-app") is None

    # REPLAY: re-applying any already-recorded batch is a guarded no-op —
    # without the ledger this double-counts (the fold is NOT value-idempotent)
    v_before = versioned.current_version(table)
    applied = US.apply_counter_batch(
        spark, table, ev, batch_id=0, app_id="counter-stream"
    )
    assert applied is False
    assert versioned.current_version(table) == v_before
    # a genuinely NEW batch id still applies
    extra = spark.createDataFrame(
        [(10**9, "view", 2.5)], "event_id long, event_type string, value double"
    )
    assert US.apply_counter_batch(
        spark, table, extra, batch_id=3, app_id="counter-stream", now=2_000.0
    ) is True
    n_after = {
        r["event_type"]: r["n_events"]
        for r in spark.read.parquet(table).collect()
    }
    assert n_after["view"] == want["view"][0] + 1
    assert versioned.last_txn_version(table, "counter-stream") == 3


def test_ledgers_are_per_app_id(spark, tmp_path):
    table = str(tmp_path / "state")
    b = spark.createDataFrame(
        [(1, "click", 1.0)], "event_id long, event_type string, value double"
    )
    assert US.apply_counter_batch(spark, table, b, 0, app_id="app-a", now=1.0)
    # app-b's batch 0 is NOT shadowed by app-a's ledger entry
    assert US.apply_counter_batch(spark, table, b, 0, app_id="app-b", now=2.0)
    # but app-a replaying 0 is
    assert not US.apply_counter_batch(spark, table, b, 0, app_id="app-a")
    got = spark.read.parquet(table).collect()[0]
    assert got["n_events"] == 2


def test_checkpoint_restart_does_not_refold(spark, tmp_path):
    """A second availableNow run over the same landing dir (checkpoint
    intact) discovers no new files and the state is unchanged — and even
    if the checkpoint were lost, the ledger would stop the refold."""
    landing, ev = _landing(spark, tmp_path)
    table = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    US.counter_fold_ingest(
        spark, landing, table, ckpt,
        app_id="counter-stream", schema=ev.schema, now=1_000.0,
    )
    v1 = versioned.current_version(table)
    US.counter_fold_ingest(
        spark, landing, table, ckpt,
        app_id="counter-stream", schema=ev.schema, now=3_000.0,
    )
    assert versioned.current_version(table) == v1
    # checkpoint LOST: the stream replays every batch; the ledger skips all
    US.counter_fold_ingest(
        spark, landing, table, str(tmp_path / "ckpt2"),
        app_id="counter-stream", schema=ev.schema, now=4_000.0,
    )
    assert versioned.current_version(table) == v1


def test_null_group_folds_into_one_standing_row(spark, tmp_path):
    """ADVICE r10: the cross-batch fold joins old state to the batch
    delta with eqNullSafe — a NULL group key must accumulate into ONE
    standing row across batches, exactly like SQL GROUP BY treats NULL
    as a single group, never spawn a fresh unmatched pair per batch."""
    table = str(tmp_path / "state")
    b = spark.createDataFrame(
        [(1, None, 10.0), (2, "x", 1.0)],
        "event_id long, event_type string, value double",
    )
    assert US.apply_counter_batch(spark, table, b, 0, app_id="nulls", now=1.0)
    assert US.apply_counter_batch(spark, table, b, 1, app_id="nulls", now=2.0)
    rows = {
        r["event_type"]: (r["n_events"], float(r["total_value"]))
        for r in spark.read.parquet(table).collect()
    }
    assert len(rows) == 2  # one NULL group, one 'x' group — no dup NULLs
    assert rows[None] == (2, 20.0)
    assert rows["x"] == (2, 2.0)
