"""Streaming matview maintenance: CDC micro-batches MERGE into the
versioned base and the view folds each commit's CDF incrementally —
view == full recompute after every batch, refreshes are incremental
(never MV_CREATE), and checkpointed re-runs no-op."""

from __future__ import annotations

import pytest

import os
import shutil

from pyspark.sql import functions as F

from medallion_data_warehouse_on_azure_with_databricks_pyspark_spark.plans import matview as MV
from medallion_data_warehouse_on_azure_with_databricks_pyspark_spark.sources import versioned as V
from medallion_data_warehouse_on_azure_with_databricks_pyspark_spark.streaming.matview_stream import (
    matview_maintained_ingest,
)

SCHEMA = "id long, g string, v long, op string, seq long"



#: opt-in tier (pytest.ini): checkpointed streaming-matview e2e harness
pytestmark = pytest.mark.slow

def _one_file(df, src, name):
    df.coalesce(1).write.parquet(f"{src}/tmp_{name}", mode="overwrite")
    for f in os.listdir(f"{src}/tmp_{name}"):
        if f.endswith(".parquet"):
            shutil.move(f"{src}/tmp_{name}/{f}", f"{src}/{name}.parquet")
    shutil.rmtree(f"{src}/tmp_{name}")


def _view_rows(spark, view):
    return {
        r["g"]: (r["n"], r["sv"])
        for r in spark.read.parquet(view).collect()
    }


def _recompute(spark, base):
    return {
        r["g"]: (r["n"], r["sv"])
        for r in spark.read.parquet(base)
        .groupBy("g")
        .agg(F.count("*").alias("n"), F.sum("v").alias("sv"))
        .collect()
    }


def test_streaming_cdc_keeps_view_fresh(spark, tmp_path):
    base, view = str(tmp_path / "base"), str(tmp_path / "view")
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    os.makedirs(src)
    V.overwrite_versioned(
        spark.createDataFrame(
            [(1, "a", 10), (2, "a", 20), (3, "b", 30)], "id long, g string, v long"
        ),
        base, now=0.0,
    )
    MV.create(
        spark, base, view, key_cols=["id"], group_cols=["g"],
        agg_specs={"n": ("count", None), "sv": ("sum", "v")}, now=0.0,
    )

    # batch 1: insert id4 into group b, update id1 (two events for id1 in
    # one batch — latest-wins collapse must pick seq 11)
    _one_file(
        spark.createDataFrame(
            [(4, "b", 40, "UPSERT", 10),
             (1, "a", 15, "UPSERT", 10),
             (1, "a", 17, "UPSERT", 11)],
            SCHEMA,
        ),
        src, "b1",
    )
    s1 = matview_maintained_ingest(
        spark, src, base, view, ckpt, keys=["id"], schema=SCHEMA,
        op_col="op", sequence_col="seq", now=100.0,
    )
    assert len(s1) == 1 and s1[0]["refreshed"]
    assert _view_rows(spark, view) == _recompute(spark, base)
    assert _view_rows(spark, view) == {"a": (2, 37), "b": (2, 70)}

    # batch 2: delete id2 (group a shrinks), delete id3 + insert id5 in
    # group b, and a delete for a key that never existed (must not insert)
    _one_file(
        spark.createDataFrame(
            [(2, "a", 0, "DELETE", 20),
             (3, "b", 0, "DELETE", 20),
             (5, "b", 50, "UPSERT", 20),
             (99, "z", 0, "DELETE", 20)],
            SCHEMA,
        ),
        src, "b2",
    )
    s2 = matview_maintained_ingest(
        spark, src, base, view, ckpt, keys=["id"], schema=SCHEMA,
        op_col="op", sequence_col="seq", now=100.0,
    )
    assert len(s2) == 1 and s2[0]["refreshed"]
    assert _view_rows(spark, view) == _recompute(spark, base)
    assert _view_rows(spark, view) == {"a": (1, 17), "b": (2, 90)}
    assert "z" not in _view_rows(spark, view)

    # every view commit after create is an incremental fold, atomic with
    # its reflected base version
    ops = [e["operation"] for e in V.history(view)]
    assert ops == ["MV_REFRESH", "MV_REFRESH", "MV_CREATE"]
    assert MV.reflected_base_version(view) == V.current_version(base)

    # run 3: nothing new — checkpoint makes it a no-op (no base commit,
    # no view commit)
    base_v, view_hist = V.current_version(base), len(V.history(view))
    s3 = matview_maintained_ingest(
        spark, src, base, view, ckpt, keys=["id"], schema=SCHEMA,
        op_col="op", sequence_col="seq", now=100.0,
    )
    assert s3 == []
    assert V.current_version(base) == base_v
    assert len(V.history(view)) == view_hist


def test_replayed_batch_is_idempotent_by_cdf(spark, tmp_path):
    """The exactly-once-in-effect argument: re-delivering a batch the
    base already absorbed merges value-identical rows, the null-safe CDF
    sees no change, and the view neither double-counts nor commits."""
    base, view = str(tmp_path / "base"), str(tmp_path / "view")
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    os.makedirs(src)
    V.overwrite_versioned(
        spark.createDataFrame([(1, "a", 10)], "id long, g string, v long"),
        base, now=0.0,
    )
    MV.create(
        spark, base, view, key_cols=["id"], group_cols=["g"],
        agg_specs={"n": ("count", None), "sv": ("sum", "v")}, now=0.0,
    )
    batch = spark.createDataFrame(
        [(2, "a", 5, "UPSERT", 1)], SCHEMA
    )
    _one_file(batch, src, "b1")
    matview_maintained_ingest(
        spark, src, base, view, ckpt, keys=["id"], schema=SCHEMA,
        op_col="op", sequence_col="seq", now=50.0,
    )
    assert _view_rows(spark, view) == {"a": (2, 15)}
    view_hist = len(V.history(view))
    # simulate the replay: same data, FRESH checkpoint (as if the commit
    # to the old checkpoint was lost after the merge ran)
    matview_maintained_ingest(
        spark, src, base, view, str(tmp_path / "ckpt2"), keys=["id"],
        schema=SCHEMA, op_col="op", sequence_col="seq", now=60.0,
    )
    # base re-merged identical values -> the null-safe CDF delta is
    # EMPTY -> the refresh folds nothing: no double count.  The base and
    # view each gain one commit (MERGE / empty MV_REFRESH advancing the
    # reflected version), but the data is bit-identical.
    assert _view_rows(spark, view) == {"a": (2, 15)}
    assert len(V.history(view)) == view_hist + 1
    assert V.history(view)[0]["operation"] == "MV_REFRESH"
    assert _view_rows(spark, view) == _recompute(spark, base)
