"""Custom stateful streaming operators via ``applyInPandasWithState``.

The reference has no stateful processing at all (SURVEY.md §2.9); this is
extension surface for the ``events`` stream: per-key sessionization with
event-time timeouts — the canonical "operator Spark's built-ins can't
express" (``session_window`` emits only on watermark close and cannot carry
custom per-session state or emit mid-stream).

Semantics (mirrors ``F.session_window``): a session is a maximal run of a
user's events where consecutive gaps are < ``gap``; ``session_end`` is the
last event time + gap.

Emission contract:

* a session **closed by a later event in the same micro-batch** is emitted
  in that batch;
* a session left open waits in the state store with an event-time timeout
  at ``last_event + gap``; when the watermark passes it, the timed-out
  session is emitted and its state removed.

Scale: state is one 3-tuple per open session per key — O(active keys), not
O(events).  The watermark bounds both late data and state lifetime; the
per-key shuffle is the same exchange a ``groupBy(user)`` aggregation pays.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame

SESSION_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, n_events long"
)
_STATE_SCHEMA = "start long, last long, n long"

_US = 1_000_000  # µs per second


def sessionize(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    gap_seconds: int = 1800,
    watermark: str = "0 seconds",
) -> DataFrame:
    """Stateful sessionization of a *streaming* DataFrame.

    Returns an append-mode stream of closed sessions
    ``(user_id, session_start, session_end, n_events)``.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_us = gap_seconds * _US

    def fn(key, pdfs, state: GroupState):
        (user,) = key
        if state.hasTimedOut:
            start, last, n = state.get
            state.remove()
            yield _emit(user, [(start, last, n)], gap_us)
            return

        ts = pd.concat([pdf[ts_col] for pdf in pdfs]).sort_values()
        # pandas datetime64[ns] → epoch µs
        times = (ts.astype("int64") // 1000).tolist()
        if not times:
            return

        if state.exists:
            start, last, n = state.get
        else:
            start = last = n = 0
        closed: list[tuple[int, int, int]] = []
        for t in times:
            if n == 0:  # first-ever event for this key
                start, last, n = t, t, 1
            elif t - last >= gap_us:
                closed.append((start, last, n))
                start, last, n = t, t, 1
            else:
                last, n = t, n + 1
        state.update((start, last, n))
        # Event-time timeout: fire when the watermark passes last + gap.
        state.setTimeoutTimestamp((last + gap_us) // 1000)  # ms
        if closed:
            yield _emit(user, closed, gap_us)

    return (
        df.withWatermark(ts_col, watermark)
        .groupBy(key_col)
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def _emit(user, sessions: list[tuple[int, int, int]], gap_us: int) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "user_id": [user] * len(sessions),
            "session_start": [pd.Timestamp(s, unit="us") for s, _, _ in sessions],
            "session_end": [pd.Timestamp(l + gap_us, unit="us") for _, l, _ in sessions],
            "n_events": [n for _, _, n in sessions],
        }
    )


#: Built-in state store providers (``spark.sql.streaming.stateStore
#: .providerClass``, read per-query at start).  The JVM-heap HDFS-backed
#: store is Spark's default and wins for small state (measured at sf0.1,
#: 150 keys: 4.0 s vs RocksDB's 4.3 s — RocksDB pays native-store setup per
#: partition).  RocksDB keeps state off-heap with incremental checkpoints
#: and is the right choice once state no longer fits comfortably in the
#: executor heap — ~10⁶+ open sessions per executor — where the heap store
#: GC-thrashes.  The rocksdbjni jar ships with Spark; no extra install.
HDFS_STATE_STORE = (
    "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"
)
ROCKSDB_STATE_STORE = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def run_to_memory(
    spark,
    stream: DataFrame,
    checkpoint_dir: str,
    state_partitions: int | None = None,
    state_store_provider: str | None = None,
) -> DataFrame:
    """Run any streaming DataFrame to completion (``trigger(availableNow)``)
    into an in-memory sink and return the accumulated result as a batch
    DataFrame.  Used to batchify stateful streams for tests and the driver's
    oracle harness (the reference batchifies the same way with
    ``trigger(once=True)``, ``/root/reference/Bronze_Layer.py:36``).

    With a single input file (one micro-batch), a sessionizer's emitted set
    is exactly "every session closed by a later event of the same key" —
    all sessions except each key's last — which is SQL-expressible.

    ``state_partitions`` sizes the stateful shuffle (pinned into the
    checkpoint at first run): one state-store instance per partition, so
    match it to active-key cardinality ÷ desired keys-per-task — 32 stores
    for 150 keys is measured ~3× slower than 8 purely on per-store
    overhead; a 100 TB stream with 10⁸ keys wants thousands.

    ``state_store_provider`` picks the state-store backend for this query
    (see :data:`HDFS_STATE_STORE` / :data:`ROCKSDB_STATE_STORE` for the
    sizing rule); ``None`` keeps the session default.
    """
    import uuid

    old = spark.conf.get("spark.sql.shuffle.partitions")
    provider_key = "spark.sql.streaming.stateStore.providerClass"
    old_provider = spark.conf.get(provider_key, None)
    if state_partitions is not None:
        spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    if state_store_provider is not None:
        spark.conf.set(provider_key, state_store_provider)
    try:
        name = f"mem_{uuid.uuid4().hex[:8]}"
        q = (
            stream.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        if state_partitions is not None:
            spark.conf.set("spark.sql.shuffle.partitions", old)
        if state_store_provider is not None:
            if old_provider is None:
                spark.conf.unset(provider_key)
            else:
                spark.conf.set(provider_key, old_provider)
    return spark.table(name)


ANOMALY_SCHEMA = (
    "event_id long, event_type string, value double, "
    "n_window long, dev_sq long, var_term long"
)
_ANOM_STATE_SCHEMA = "vals array<bigint>"


def rolling_anomaly_stream(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    lookback: int = 20,
    min_points: int = 8,
    z: int = 3,
    fp_scale: int = 1000,
) -> DataFrame:
    """Streaming twin of ``operators/temporal.py rolling_anomaly``: the
    per-key window of the last ``lookback`` fixed-point values rides the
    STATE STORE across micro-batches, so a spike arriving in batch 7 is
    judged against a baseline that started in batch 2 — the on-arrival
    alerting shape, versus the batch lane's retrospective sweep.

    Same integer-exact z-test (cross-multiplied inequality, no float
    accumulation) and the same (ts, id) ordering WITHIN a batch; across
    batches the operator assumes per-key arrival order (the time-split
    landing-file pattern), under which its emitted set is EXACTLY the
    batch lane's — the equality the driver lane's oracle checks.  State
    is ≤ ``lookback`` bigints per key — O(active keys), independent of
    stream length; no timeout, rows emit on arrival.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    zsq = z * z

    def fn(key, pdfs, state: GroupState):
        (k,) = key
        pdf = pd.concat(list(pdfs))
        if pdf.empty:
            return
        pdf = pdf.sort_values([ts_col, id_col])
        hist = list(state.get[0]) if state.exists else []
        # running exact integer sums over the deque — O(1) per row
        # (recomputing per row is O(rows × lookback) in pure Python)
        s1 = sum(hist)
        s2 = sum(x * x for x in hist)
        out_ids, out_vals, out_n, out_dev, out_var = [], [], [], [], []
        import math

        for eid, val in zip(
            pdf[id_col].tolist(), pdf[value_col].tolist()
        ):
            v = int(math.floor(val * fp_scale))
            n = len(hist)
            if n >= min_points:
                dev = n * v - s1
                dev_sq = dev * dev
                var_term = n * s2 - s1 * s1
                if dev_sq * (n - 1) > zsq * n * var_term:
                    out_ids.append(int(eid))
                    out_vals.append(float(val))
                    out_n.append(n)
                    out_dev.append(dev_sq)
                    out_var.append(var_term)
            hist.append(v)
            s1 += v
            s2 += v * v
            if len(hist) > lookback:
                old = hist.pop(0)
                s1 -= old
                s2 -= old * old
        state.update((hist,))
        if out_ids:
            yield pd.DataFrame(
                {
                    "event_id": out_ids,
                    "event_type": [k] * len(out_ids),
                    "value": out_vals,
                    "n_window": out_n,
                    "dev_sq": out_dev,
                    "var_term": out_var,
                }
            )

    return df.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=ANOMALY_SCHEMA,
        stateStructType=_ANOM_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
