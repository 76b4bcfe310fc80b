"""Temporal join operators: as-of join and range (interval) join.

Neither exists as a built-in Spark join type (the reference engine has no
equivalent either — this is extension surface for event/time-series
workloads).  Both are implemented as compositions of shuffle-friendly
DataFrame primitives, never an inequality-only nested-loop join:

* :func:`asof_join` — "attach the most recent right row at-or-before each
  left row's timestamp, per key" (ANSI/DuckDB ``ASOF JOIN``, pandas
  ``merge_asof``).  Implemented as a tagged union + one running
  ``last(ignorenulls)`` window: a single hash shuffle on the key and one
  sort — exactly the cost profile of a sort-merge join, independent of how
  far back the match is.  A naive formulation (theta-join on
  ``l.ts >= r.ts`` + max-per-key) explodes to O(|L|·|R|) per key; this one
  is O((|L|+|R|) log) per key.
* :func:`range_join` — "match right points falling inside each left row's
  [start, end] interval, per key".  Implemented by time-bucketing both
  sides at the interval width: each left interval lands in
  ``span/width + 1`` buckets (≈2 when width ≳ span), each right point in
  exactly one, and the equi-join on (key, bucket) makes the range predicate
  a residual filter on co-located rows.  This is the standard
  bucketed-range-join rewrite (DuckDB/Databricks range-join hints do the
  same under the hood).

Scale notes (100 TB):

* Both operators shuffle on the join key (+ bucket) only — Catalyst prunes
  unused columns into the exchange, AQE coalesces small partitions.
* Hot keys: the window in :func:`asof_join` needs the whole key ordered in
  one partition, so an extremely hot key serializes (same constraint as any
  per-key ordered scan).  Mitigation: ``asof_join(..., coarse_bucket=W)``
  re-partitions on (key, time-bucket) with one-bucket carry-over, trading
  a bounded lookback horizon (matches older than ``(⌊left_ts/W⌋-1)·W`` are
  nulled) for per-bucket parallelism within the hot key.
* ``range_join`` fan-out is ``span/width + 1`` bucket copies of the *left*
  side only; pick ``bucket_width`` ≈ the typical interval span.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_MARK = "__asof_side"  # 0 = right (visible), 1 = left (probing)
_TS = "__asof_ts"
_PAYLOAD = "__asof_payload"
_BUCKET = "__asof_bucket"


def _coarse_bucket_col(col: Column, dtype, width: int) -> Column:
    """Exact ``floor(ts/width)`` as a long; timestamps bucket in epoch
    micros.  ``pmod`` keeps the division an exact multiple (no float-floor
    edge at negative timestamps)."""
    from pyspark.sql.types import DateType, TimestampNTZType, TimestampType

    if isinstance(dtype, (TimestampType, TimestampNTZType)):
        num = F.unix_micros(col)
    elif isinstance(dtype, DateType):
        num = F.datediff(col, F.lit("1970-01-01").cast("date")).cast("long")
    else:
        num = col.cast("long")
    # Keep the division integral: `/` on longs is double division in Spark,
    # which loses exactness past 2^53 (epoch micros after ~year 2255).  The
    # numerator is an exact multiple of width, so decimal division yields an
    # integral value that casts to long without truncation error.
    exact_multiple = (num - F.pmod(num, F.lit(width))).cast("decimal(38,0)")
    return (exact_multiple / F.lit(width)).cast("long")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    left_ts: str,
    right_ts: str | None = None,
    right_cols: list[str] | None = None,
    suffix: str = "_asof",
    tolerance: Column | None = None,
    right_seq: str | None = None,
    coarse_bucket: int | None = None,
) -> DataFrame:
    """Backward as-of left join: for every left row, attach the right row
    with the greatest ``right_ts <= left_ts`` sharing the ``on`` key(s);
    nulls when no prior right row exists.

    ``right_cols`` (default: every non-key, non-ts right column) are
    attached as ``<name><suffix>``; ``right_ts`` itself is always attached
    (as ``<right_ts><suffix>``) so callers can window/yardstick the match.
    Output names must be unique — a suffix that collides with a left column
    (e.g. ``suffix=""`` with ``right_ts == left_ts``) raises rather than
    emitting an ambiguous duplicate column.
    ``tolerance`` (a Column interval/numeric matching the ts type's
    difference semantics is *not* needed — pass a Column predicate bound
    instead): when given, matches older than ``left_ts - tolerance`` are
    nulled out.  ``right_seq`` breaks ties between right rows sharing
    (key, ts) — the highest wins, matching "latest version" semantics;
    without it equal-ts right duplicates are resolved arbitrarily (DuckDB
    ASOF has the same caveat — dedupe upstream for determinism).

    ``coarse_bucket`` (hot-key mitigation): partition the ordered scan on
    (key, ``floor(ts/W)``) instead of the key alone, with every right row
    carried over into the following bucket.  Bounded-lookback contract:
    a left row at ``t`` (bucket ``b = floor(t/W)``) sees exactly the right
    rows with ``right_ts >= (b-1)·W`` — any match within ``W`` of ``t`` is
    always found, anything older than ``2W`` never is, and the cutoff is
    the deterministic bucket boundary ``(b-1)·W`` (oracle-expressible).
    Pick ``W`` ≥ the staleness horizon the workload tolerates; cost is one
    duplicated right stream (2× right rows through the shuffle).  Units:
    epoch **micros** for timestamp columns, days for dates, the column's
    own unit for numerics.

    Plan shape: one Exchange(hashpartitioning(on[, bucket])) + one sort
    over the tagged union; the running ``last(payload, ignorenulls=True)``
    is a single Window node.  At equal timestamps right rows sort *before*
    left rows, so a right row at exactly ``left_ts`` is matched (inclusive
    bound, = DuckDB ``ON l.ts >= r.ts``).
    """
    keys = [on] if isinstance(on, str) else list(on)
    right_ts = right_ts or left_ts
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in keys and c != right_ts]
    out_names = (
        list(left.columns)
        + [f"{right_ts}{suffix}"]
        + [f"{c}{suffix}" for c in right_cols]
    )
    dupes = sorted({n for n in out_names if out_names.count(n) > 1})
    if dupes:
        raise ValueError(
            f"asof_join output column collision on {dupes}; pass a suffix "
            "that does not clash with left columns"
        )

    payload_fields = [F.col(right_ts).alias("__ts"), *[F.col(c).alias(c) for c in right_cols]]
    seq = F.col(right_seq) if right_seq is not None else F.lit(0)
    r = right.select(
        *keys,
        F.col(right_ts).alias(_TS),
        F.lit(0).alias(_MARK),
        seq.alias("__asof_seq"),
        F.struct(*payload_fields).alias(_PAYLOAD),
    )
    l = left.select(
        "*",
        F.col(left_ts).alias(_TS),
        F.lit(1).alias(_MARK),
        F.lit(0).alias("__asof_seq"),
        F.lit(None).cast(r.schema[_PAYLOAD].dataType).alias(_PAYLOAD),
    )
    part_cols: list[str] = list(keys)
    if coarse_bucket is not None:
        width = int(coarse_bucket)
        if width <= 0:
            raise ValueError("coarse_bucket must be a positive integer")
        # Buckets are computed per-side from each ts column's dtype; mixed
        # dtypes (e.g. date left vs timestamp right) would bucket in
        # different units (days vs micros) and silently mispartition — rows
        # within the horizon would null out.  Refuse instead.
        l_dtype, r_dtype = l.schema[_TS].dataType, r.schema[_TS].dataType
        if l_dtype != r_dtype:
            raise TypeError(
                f"coarse_bucket requires matching ts dtypes; got left "
                f"{l_dtype.simpleString()} vs right {r_dtype.simpleString()} "
                "— cast one side before the join"
            )
        rb = _coarse_bucket_col(F.col(_TS), r.schema[_TS].dataType, width)
        # carry-over: each right row is visible in its own bucket and the
        # next one, so a left row's lookback spans its full previous bucket.
        r = r.withColumn(_BUCKET, F.explode(F.array(rb, rb + 1)))
        l = l.withColumn(
            _BUCKET, _coarse_bucket_col(F.col(_TS), l.schema[_TS].dataType, width)
        )
        part_cols.append(_BUCKET)

    # unionByName with missing left columns nulled on the right side
    u = l.unionByName(r, allowMissingColumns=True)

    w = (
        Window.partitionBy(*part_cols)
        .orderBy(F.col(_TS).asc(), F.col(_MARK).asc(), F.col("__asof_seq").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = u.withColumn("__match", F.last(_PAYLOAD, ignorenulls=True).over(w)).filter(
        F.col(_MARK) == 1
    )
    if tolerance is not None:
        matched = matched.withColumn(
            "__match",
            F.when(
                F.col("__match.__ts") >= F.col(_TS) - tolerance, F.col("__match")
            ),
        )
    out = matched.select(
        *[F.col(c) for c in left.columns],
        F.col("__match.__ts").alias(f"{right_ts}{suffix}"),
        *[F.col(f"__match.{c}").alias(f"{c}{suffix}") for c in right_cols],
    )
    return out


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    left_start: str,
    left_end: str,
    right_point: str,
    bucket_width: int,
    include_start: bool = False,
    include_end: bool = True,
) -> DataFrame:
    """Bucketed interval join: right rows whose numeric ``right_point``
    falls in each left row's (``left_start``, ``left_end``] interval,
    sharing the ``on`` key(s).  Inner-join semantics (left rows with no
    match produce nothing — re-attach with a left join on the left's key if
    zero-rows matter; that keeps *this* plan a pure equi-join).

    All three range columns must be numeric (epoch micros for timestamps —
    ``F.unix_micros``); ``bucket_width`` is in the same unit.  Each left
    interval is exploded to its covering bucket ids
    (``floor(start/W) .. floor(end/W)``), each right point maps to exactly
    one bucket, and the join is a plain equi-join on (keys…, bucket) with
    the exact range predicate as a residual filter — no per-row cross
    product, and each qualifying (left, right) pair appears exactly once
    (bucket ids per left row are distinct).

    Bound inclusivity defaults to half-open ``(start, end]`` — the event-
    window convention where the anchoring event itself (at ``start``) is
    excluded.
    """
    keys = [on] if isinstance(on, str) else list(on)
    w = int(bucket_width)
    if w <= 0:
        raise ValueError("bucket_width must be a positive integer")

    lb = left.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(left_start) / w).cast("long"),
                F.floor(F.col(left_end) / w).cast("long"),
            )
        ),
    )
    rb = right.withColumn("__bucket", F.floor(F.col(right_point) / w).cast("long"))

    lo = (
        rb[right_point] >= lb[left_start]
        if include_start
        else rb[right_point] > lb[left_start]
    )
    hi = (
        rb[right_point] <= lb[left_end]
        if include_end
        else rb[right_point] < lb[left_end]
    )
    cond = [lb["__bucket"] == rb["__bucket"], *[lb[k] == rb[k] for k in keys], lo, hi]
    from functools import reduce

    joined = lb.join(rb, reduce(lambda a, b: a & b, cond), "inner")
    # resolve ambiguous key/bucket columns to the left side, drop helpers
    return joined.drop(rb["__bucket"]).drop(lb["__bucket"]).drop(*[rb[k] for k in keys])


def rolling_anomaly(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    lookback: int = 20,
    min_points: int = 8,
    z: int = 3,
    fp_scale: int = 1000,
    shards: int | None = None,
) -> DataFrame:
    """Rolling z-score anomaly detection: flag a row whose value sits more
    than ``z`` sample standard deviations from the mean of its key's
    previous ``lookback`` rows (the current row is EXCLUDED — an outlier
    must not mask itself by inflating its own baseline).

    Numerics are INTEGER end-to-end so the flag is bit-identical in any
    engine: values go fixed-point (``floor(v·fp_scale)``), the window
    keeps exact integer ``(n, Σv, Σv²)``, and the z-test is the cross
    -multiplied inequality ``(n·v − Σv)²·(n−1) > z²·n·(n·Σv² − (Σv)²)``
    — no division, no sqrt, no float accumulation anywhere.  A
    zero-variance window degenerates correctly: any deviation flags,
    agreement does not.  ``min_points`` gates the warmup.

    Scale shape: one window over ``(key, ts, id)`` — a single shuffle by
    key, running sums map-side within partitions.  ``shards`` (round 12)
    engages ``operators/skew.py sub_sharded_bounded_window`` for hot
    keys: the key's timeline splits into time-range sub-shards that
    window independently, each seeded with the previous shard's last
    ``lookback`` rows — per-key parallelism × ``shards``, bit-identical
    output (pinned by the oracle-equality pytest; requires numeric
    ``ts``).  Output: flagged rows only, with the window evidence
    ``(n_window, dev_sq, var_term)`` kept for audit.
    """
    vfp = F.floor(F.col(value_col) * F.lit(float(fp_scale))).cast("long")
    dfv = df.withColumn("__v", vfp)
    exprs = {
        "__n": lambda w: F.count("__v").over(w),
        "__s1": lambda w: F.sum("__v").over(w),
        "__s2": lambda w: F.sum(F.col("__v") * F.col("__v")).over(w),
    }
    if shards:
        from .skew import sub_sharded_bounded_window

        base = sub_sharded_bounded_window(
            dfv, key_col, ts_col, id_col, lookback, exprs, shards=shards,
            hot_threshold=2 * shards * lookback,
        )
    else:
        w = (
            Window.partitionBy(key_col)
            .orderBy(ts_col, id_col)
            .rowsBetween(-lookback, -1)
        )
        base = dfv
        for name, fn in exprs.items():
            base = base.withColumn(name, fn(w))
    dev = F.col("__n") * F.col("__v") - F.col("__s1")
    dev_sq = dev * dev
    var_term = F.col("__n") * F.col("__s2") - F.col("__s1") * F.col("__s1")
    flagged = base.filter(
        (F.col("__n") >= min_points)
        & (dev_sq * (F.col("__n") - 1) > F.lit(z * z) * F.col("__n") * var_term)
    )
    return flagged.select(
        F.col(id_col),
        F.col(key_col),
        F.col(value_col),
        F.col("__n").alias("n_window"),
        dev_sq.alias("dev_sq"),
        var_term.alias("var_term"),
    )
