"""Event-time windowed aggregation (extension surface).

The reference has **no** watermarks, event-time windows, or stateful
aggregation (SURVEY.md §2.9) — its only sequencing is processing-time
``current_timestamp()``.  A complete engine needs them for the ``events``
stream table, so this module provides tumbling/sliding/session windows with
late-data handling.  The same functions work on batch DataFrames (Spark's
``window()`` is mode-agnostic), which is also how the oracle checks them.

Scale: windowed aggregation state lives in the state store keyed by
(window, group); the watermark bounds state size — without it an unbounded
stream accumulates state forever.  Always set a watermark in production
streams.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def tumbling(
    df: DataFrame,
    ts_col: str,
    duration: str,
    group_cols: list[str],
    aggs: list[Column],
    watermark: str | None = None,
) -> DataFrame:
    """Tumbling event-time window aggregation.

    Output flattens the window struct to ``window_start``/``window_end`` so
    results are plain columns (and oracle-comparable).
    """
    if watermark is not None and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    out = df.groupBy(F.window(F.col(ts_col), duration), *group_cols).agg(*aggs)
    return out.select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        *group_cols,
        *[c for c in out.columns if c not in ("window", *group_cols)],
    )


def sliding(
    df: DataFrame,
    ts_col: str,
    duration: str,
    slide: str,
    group_cols: list[str],
    aggs: list[Column],
    watermark: str | None = None,
) -> DataFrame:
    """Sliding (hopping) window — each event lands in duration/slide windows."""
    if watermark is not None and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    out = df.groupBy(
        F.window(F.col(ts_col), duration, slide), *group_cols
    ).agg(*aggs)
    return out.select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        *group_cols,
        *[c for c in out.columns if c not in ("window", *group_cols)],
    )


def session_window(
    df: DataFrame,
    ts_col: str,
    gap: str,
    group_cols: list[str],
    aggs: list[Column],
    watermark: str | None = None,
) -> DataFrame:
    """Session windows: events within ``gap`` of each other merge."""
    if watermark is not None and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    out = df.groupBy(
        F.session_window(F.col(ts_col), gap), *group_cols
    ).agg(*aggs)
    return out.select(
        F.col("session_window.start").alias("window_start"),
        F.col("session_window.end").alias("window_end"),
        *group_cols,
        *[c for c in out.columns if c not in ("session_window", *group_cols)],
    )


def dedup_stream(
    df: DataFrame,
    keys: list[str],
    ts_col: str | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """Streaming deduplication on ``keys``.

    With ``ts_col`` + ``watermark`` set, uses
    ``dropDuplicatesWithinWatermark`` — the only form whose state is
    bounded on an unbounded stream: a key's fingerprint is held just until
    the watermark passes it, so duplicates arriving within the lateness
    horizon are caught and state is O(keys-per-horizon), not O(all keys
    ever).  Plain ``dropDuplicates`` on a stream grows state forever and
    is only offered here for bounded (``availableNow`` backfill) runs.

    Works identically on batch frames (state machinery compiles away),
    which is how the oracle checks it.
    """
    if ts_col is not None and watermark is not None and df.isStreaming:
        return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            keys
        )
    return df.dropDuplicates(keys)
