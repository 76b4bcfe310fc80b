"""Stream-stream interval (event-time range) joins.

The reference joins only batch/static frames (its MERGEs and dim
enrichments — e.g. ``/root/reference/Gold_Orders.py:60-81`` joins a
staged batch to a dim table).  A complete streaming engine also needs
the *stream×stream* join: correlate two live event streams on a key
within an event-time interval (the canonical ad-attribution shape:
``view`` joined to the ``purchase`` that follows it within an hour).

Spark-first design: this is exactly Structured Streaming's watermarked
interval join — both sides declare a watermark, the join condition
carries an event-time range, and the state store keeps each side's rows
only until the other side's watermark proves no future match can arrive.
No custom state code is needed; the built-in join IS the operator.

Scale notes (100 TB / unbounded streams):
- State size is bounded by ``watermark_delay + interval`` worth of rows
  per side — the time-range predicate is MANDATORY here, not an
  optimization; without it Spark must keep every row forever.
- The join shuffles both sides by the equi-key; skewed keys (one hot
  user) concentrate state — mitigate upstream with per-key rate caps,
  not inside the join.
- Inner join emits matches as they are found, so results stream out
  with no watermark latency; outer variants hold the unmatched side
  until the watermark closes (higher latency, same state bound).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    lower: str = "0 seconds",
    upper: str = "1 hour",
    watermark: str = "2 hours",
    how: str = "inner",
    extra_condition: Column | None = None,
) -> DataFrame:
    """Event-time interval join: match right rows whose timestamp falls in
    ``[left_ts + lower, left_ts + upper]`` for the same ``key``.

    Works identically on batch and streaming frames (the oracle replays
    the batch twin); on streams both sides get ``watermark`` so the state
    store can evict.  Column names must be disjoint apart from ``key``
    (callers alias first) — the output carries every column from both
    sides with the key once.
    """
    lft = left.alias("l")
    rgt = right.alias("r")
    if left.isStreaming:
        lft = lft.withWatermark(left_ts, watermark)
    if right.isStreaming:
        rgt = rgt.withWatermark(right_ts, watermark)
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col(f"r.{right_ts}") >= F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {lower}"))
        & (F.col(f"r.{right_ts}") <= F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {upper}"))
    )
    if extra_condition is not None:
        cond = cond & extra_condition
    joined = lft.join(rgt, cond, how)
    # Key appears on both sides; surface it once.
    keep = [F.col(f"l.{key}").alias(key)]
    keep += [F.col(f"l.{c}").alias(c) for c in left.columns if c != key]
    keep += [F.col(f"r.{c}").alias(c) for c in right.columns if c != key]
    return joined.select(*keep)
