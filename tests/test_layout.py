"""Z-order layout: Morton key correctness vs a Python reference, and the
range-disjoint file property the pruning story depends on."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from medallion_data_warehouse_on_azure_with_databricks_pyspark_spark.functions import (
    layout,
)


def _morton_ref(a: int, b: int, bits: int = 31) -> int:
    out = 0
    for i in range(bits):
        out |= ((a >> i) & 1) << (2 * i)
        out |= ((b >> i) & 1) << (2 * i + 1)
    return out


def test_zorder_key_matches_python_reference(spark):
    import random

    rng = random.Random(5)
    rows = [(rng.randrange(0, 1 << 31), rng.randrange(0, 1 << 31)) for _ in range(200)]
    rows += [(0, 0), (1, 0), (0, 1), ((1 << 31) - 1, (1 << 31) - 1)]
    df = spark.createDataFrame(rows, "a long, b long")
    got = {
        (r["a"], r["b"]): r["z"]
        for r in df.withColumn("z", layout.zorder_key("a", "b")).collect()
    }
    for a, b in rows:
        assert got[(a, b)] == _morton_ref(a, b), (a, b)


def test_zorder_layout_files_are_range_disjoint_and_compact(spark, tmp_path):
    """After zorder_layout, each parquet file covers a Morton range that
    does not overlap any other file's — the precondition for min/max
    skipping on both dimensions."""
    import itertools

    df = spark.range(4096).select(
        (F.col("id") % 64).alias("x"), (F.col("id") / 64).cast("long").alias("y")
    )
    out = tmp_path / "z"
    layout.zorder_layout(df, "x", "y", n_files=8).write.parquet(str(out))
    back = (
        spark.read.parquet(str(out))
        .withColumn("z", layout.zorder_key("x", "y"))
        .withColumn("f", F.input_file_name())
    )
    ranges = {
        r["f"]: (r["mn"], r["mx"])
        for r in back.groupBy("f").agg(
            F.min("z").alias("mn"), F.max("z").alias("mx")
        ).collect()
    }
    assert len(ranges) >= 4
    for (f1, (a1, b1)), (f2, (a2, b2)) in itertools.combinations(ranges.items(), 2):
        assert b1 < a2 or b2 < a1, (f1, f2)  # no Morton-range overlap
