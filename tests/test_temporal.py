"""As-of join and range join: semantics, edges, and plan shapes."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from medallion_data_warehouse_on_azure_with_databricks_pyspark_spark.operators import (
    temporal,
)


def _left(spark):
    return spark.createDataFrame(
        [(1, 100, "a"), (1, 200, "b"), (2, 150, "c"), (3, 50, "d")],
        "k int, ts long, tag string",
    )


def _right(spark):
    return spark.createDataFrame(
        [(1, 100, 10.0), (1, 150, 11.0), (2, 149, 20.0), (2, 151, 21.0)],
        "k int, ts long, v double",
    )


def test_asof_backward_inclusive(spark):
    out = temporal.asof_join(
        _left(spark), _right(spark), on="k", left_ts="ts", right_cols=["v"]
    )
    by_tag = {r["tag"]: r for r in out.collect()}
    # a: right row at exactly ts=100 matches (inclusive bound)
    assert by_tag["a"]["v_asof"] == 10.0
    # b: latest of the two prior rows wins
    assert by_tag["b"]["v_asof"] == 11.0
    # c: 149 <= 150 matches, 151 does not
    assert by_tag["c"]["v_asof"] == 20.0
    # d: no prior right row -> nulls
    assert by_tag["d"]["v_asof"] is None


def test_asof_tolerance_nulls_stale_matches(spark):
    out = temporal.asof_join(
        _left(spark),
        _right(spark),
        on="k",
        left_ts="ts",
        right_cols=["v"],
        tolerance=F.lit(10),
    )
    by_tag = {r["tag"]: r for r in out.collect()}
    assert by_tag["a"]["v_asof"] == 10.0       # age 0 <= 10
    assert by_tag["b"]["v_asof"] is None       # age 50 > 10 -> nulled
    assert by_tag["c"]["v_asof"] == 20.0       # age 1


def test_asof_right_seq_breaks_equal_ts_ties(spark):
    left = spark.createDataFrame([(1, 100)], "k int, ts long")
    right = spark.createDataFrame(
        [(1, 100, 1, "old"), (1, 100, 2, "new")], "k int, ts long, seq int, v string"
    )
    out = temporal.asof_join(
        left, right, on="k", left_ts="ts", right_cols=["v"], right_seq="seq"
    )
    assert out.collect()[0]["v_asof"] == "new"


def test_asof_plan_single_key_exchange(spark):
    out = temporal.asof_join(
        _left(spark), _right(spark), on="k", left_ts="ts", right_cols=["v"]
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    # one hash exchange on the key, one Window; crucially no join node at all
    assert plan.count("Exchange hashpartitioning(k") == 1
    assert "Join" not in plan


def test_range_join_bounds_and_fanout(spark):
    left = spark.createDataFrame(
        [(1, 1, 100, 200)], "id int, k int, start long, stop long"
    )
    right = spark.createDataFrame(
        [(1, 100, "at_start"), (1, 150, "inside"), (1, 200, "at_end"),
         (1, 201, "after"), (2, 150, "wrong_key")],
        "k int, ts long, tag string",
    )
    out = temporal.range_join(
        left, right, on="k", left_start="start", left_end="stop",
        right_point="ts", bucket_width=50,
    )
    tags = sorted(r["tag"] for r in out.collect())
    # default (start, end]: start excluded, end included; key respected;
    # and although "inside" lands in a bucket the left interval covers via
    # two overlapping explosions, each match appears exactly once
    assert tags == ["at_end", "inside"]


def test_range_join_inclusive_start(spark):
    left = spark.createDataFrame([(1, 1, 100, 200)], "id int, k int, start long, stop long")
    right = spark.createDataFrame([(1, 100, "x")], "k int, ts long, tag string")
    out = temporal.range_join(
        left, right, on="k", left_start="start", left_end="stop",
        right_point="ts", bucket_width=1000, include_start=True,
    )
    assert out.count() == 1


def test_range_join_plan_is_equi_join(spark):
    left = _left(spark).withColumn("stop", F.col("ts") + 100)
    out = temporal.range_join(
        left, _right(spark).withColumnRenamed("ts", "rts"),
        on="k", left_start="ts", left_end="stop",
        right_point="rts", bucket_width=100,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the bucket rewrite must produce a hash-equi join, never a nested loop
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
    assert "Join" in plan


def test_asof_matches_duckdb_asof_on_events(spark, oracle):
    """Cross-engine spot check at sf0.001 via the registered workload query."""
    from medallion_data_warehouse_on_azure_with_databricks_pyspark_spark import workload
    from tests.conftest import SF_DIR, assert_matches_oracle

    df = workload.QUERIES["events_asof_join"](spark, SF_DIR)
    assert_matches_oracle(df, oracle, workload.ORACLE["events_asof_join"])


def test_asof_matches_pandas_merge_asof_random(spark):
    """Randomized cross-check vs pandas.merge_asof (fixed seed): backward
    inclusive semantics must agree on every row."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(42)
    n_l, n_r = 300, 500
    left = pd.DataFrame({
        "k": rng.integers(0, 12, n_l),
        "ts": rng.integers(0, 10_000, n_l),
        "lid": np.arange(n_l),
    }).sort_values("ts").reset_index(drop=True)
    right = pd.DataFrame({
        "k": rng.integers(0, 12, n_r),
        "ts": rng.integers(0, 10_000, n_r),
        "v": rng.random(n_r),
    })
    # unique (k, ts) on the right so both references are deterministic
    right = right.drop_duplicates(["k", "ts"]).sort_values("ts").reset_index(drop=True)

    want = pd.merge_asof(
        left, right, on="ts", by="k", direction="backward", suffixes=("", "_r")
    )
    got = temporal.asof_join(
        spark.createDataFrame(left, "k long, ts long, lid long"),
        spark.createDataFrame(right, "k long, ts long, v double"),
        on="k", left_ts="ts", right_cols=["v"],
    ).toPandas().sort_values("lid").reset_index(drop=True)
    want = want.sort_values("lid").reset_index(drop=True)
    assert len(got) == len(want)
    for a, b in zip(got["v_asof"].tolist(), want["v"].tolist()):
        assert (a is None and pd.isna(b)) or (pd.isna(b) and pd.isna(a)) or a == b


def test_asof_default_suffix_never_collides(spark):
    out = temporal.asof_join(
        _left(spark), _right(spark), on="k", left_ts="ts", right_cols=["v"]
    )
    assert len(out.columns) == len(set(out.columns))
    assert "ts_asof" in out.columns


def test_asof_colliding_suffix_raises(spark):
    with pytest.raises(ValueError, match="collision"):
        temporal.asof_join(
            _left(spark), _right(spark), on="k", left_ts="ts",
            right_cols=["v"], suffix="",
        )


def test_asof_coarse_bucket_bounded_lookback_matches_bruteforce(spark):
    """coarse_bucket=W contract: match = greatest right_ts <= left_ts with
    right_ts >= (floor(left_ts/W)-1)*W.  Randomized check vs a pandas
    brute force of exactly that predicate."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(11)
    W = 500
    left = pd.DataFrame({
        "k": rng.integers(0, 6, 400),
        "ts": rng.integers(0, 20_000, 400),
        "lid": np.arange(400),
    })
    right = pd.DataFrame({
        "k": rng.integers(0, 6, 600),
        "ts": rng.integers(0, 20_000, 600),
        "v": rng.random(600),
    }).drop_duplicates(["k", "ts"]).reset_index(drop=True)

    def brute(row):
        lo = (row["ts"] // W - 1) * W
        cand = right[(right["k"] == row["k"]) & (right["ts"] <= row["ts"]) & (right["ts"] >= lo)]
        return None if cand.empty else cand.loc[cand["ts"].idxmax(), "v"]

    want = {row["lid"]: brute(row) for _, row in left.iterrows()}
    got_df = temporal.asof_join(
        spark.createDataFrame(left, "k long, ts long, lid long"),
        spark.createDataFrame(right, "k long, ts long, v double"),
        on="k", left_ts="ts", right_cols=["v"], coarse_bucket=W,
    )
    got = {r["lid"]: r["v_asof"] for r in got_df.collect()}
    assert len(got) == len(want)
    for lid, w in want.items():
        g = got[lid]
        assert (g is None and w is None) or g == w, (lid, g, w)


def test_asof_coarse_bucket_mixed_ts_dtypes_raises(spark):
    """date-vs-timestamp ts columns would bucket in different units (days vs
    micros) and silently mispartition; the join must refuse instead."""
    left = spark.createDataFrame([(1, "2024-01-02")], "k long, d string").select(
        "k", F.col("d").cast("date").alias("ts"), F.lit(0).alias("lid")
    )
    right = spark.createDataFrame([(1, "2024-01-01 00:00:00")], "k long, t string").select(
        "k", F.col("t").cast("timestamp").alias("ts"), F.lit(1.0).alias("v")
    )
    with pytest.raises(TypeError, match="matching ts dtypes"):
        temporal.asof_join(
            left, right, on="k", left_ts="ts", right_cols=["v"], coarse_bucket=86_400,
        )


def test_coarse_bucket_col_integral_past_double_precision(spark):
    """floor(ts/W) must stay exact past 2^53 (double division would round):
    epoch-micros-sized longs bucket to the true integer quotient."""
    big = 2**60 + 3  # unrepresentable as a double
    w = 1_000
    df = spark.createDataFrame([(big,), (-big,)], "ts long").select(
        temporal._coarse_bucket_col(
            F.col("ts"), spark.createDataFrame([(1,)], "ts long").schema["ts"].dataType, w
        ).alias("b"),
        "ts",
    )
    got = {r["ts"]: r["b"] for r in df.collect()}
    assert got[big] == big // w
    assert got[-big] == -big // w  # floor semantics at negatives (pmod)


def test_asof_coarse_bucket_splits_hot_key(spark):
    """Planted hot key: with coarse_bucket the window partitions on
    (key, bucket), so the hot key's ordered scan is spread over many
    bucket partitions instead of serializing in one."""
    import pandas as pd

    n = 5_000
    left = pd.DataFrame({"k": [1] * n, "ts": range(0, 10 * n, 10), "lid": range(n)})
    right = pd.DataFrame({"k": [1] * n, "ts": range(5, 10 * n, 10), "v": [1.0] * n})
    out = temporal.asof_join(
        spark.createDataFrame(left, "k long, ts long, lid long"),
        spark.createDataFrame(right, "k long, ts long, v double"),
        on="k", left_ts="ts", right_cols=["v"], coarse_bucket=1_000,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the exchange and sort carry the bucket column -> per-bucket parallelism
    assert "__asof_bucket" in plan
    assert plan.count("Exchange hashpartitioning(k") == 1
    # ~50 buckets exist for the single key; every in-horizon match is found
    # (only lid=0 at ts=0 has no prior right row)
    assert out.filter(F.col("v_asof").isNotNull()).count() == n - 1


def test_range_join_matches_bruteforce_random(spark):
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(7)
    left = pd.DataFrame({
        "k": rng.integers(0, 8, 200),
        "start": rng.integers(0, 5_000, 200),
        "lid": np.arange(200),
    })
    left["stop"] = left["start"] + rng.integers(1, 400, 200)
    right = pd.DataFrame({
        "k": rng.integers(0, 8, 400),
        "pt": rng.integers(0, 5_500, 400),
        "rid": np.arange(400),
    })
    merged = left.merge(right, on="k")
    brute = merged[(merged["pt"] > merged["start"]) & (merged["pt"] <= merged["stop"])]
    want = set(zip(brute["lid"], brute["rid"]))
    got_df = temporal.range_join(
        spark.createDataFrame(left, "k long, start long, lid long, stop long"),
        spark.createDataFrame(right, "k long, pt long, rid long"),
        on="k", left_start="start", left_end="stop",
        right_point="pt", bucket_width=256,
    )
    got = {(r["lid"], r["rid"]) for r in got_df.collect()}
    assert got == want
