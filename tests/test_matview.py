"""Incremental materialized views: CDF-folded aggregates match recompute."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from medallion_data_warehouse_on_azure_with_databricks_pyspark_spark.plans import matview as MV
from medallion_data_warehouse_on_azure_with_databricks_pyspark_spark.sources import versioned as V

from .conftest import SF_DIR

SPECS = {"n": ("count", None), "sum_size": ("sum", "p_size")}


def _mk(spark, tmp_path):
    base = str(tmp_path / "base")
    view = str(tmp_path / "view")
    part = spark.read.parquet(f"{SF_DIR}/part.parquet").select(
        "p_partkey", "p_brand", "p_type", "p_size"
    )
    V.overwrite_versioned(part, base, now=1.0)
    MV.create(spark, base, view, key_cols=["p_partkey"],
              group_cols=["p_brand"], agg_specs=SPECS, now=1.0)
    return base, view


def _recompute(spark, base):
    return (spark.read.parquet(base).groupBy("p_brand")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("p_size").alias("sum_size")))


def _same(a, b):
    return sorted(map(tuple, a.select("p_brand", "n", "sum_size").collect())) == \
        sorted(map(tuple, b.select("p_brand", "n", "sum_size").collect()))


def test_create_matches_direct_aggregate(spark, tmp_path):
    base, view = _mk(spark, tmp_path)
    assert _same(spark.read.parquet(view), _recompute(spark, base))
    assert MV.read_meta(view)["base_version"] == 0


def test_refresh_noop_when_current(spark, tmp_path):
    base, view = _mk(spark, tmp_path)
    out = MV.refresh(spark, view)
    assert out == {"refreshed": False, "base_version": 0, "affected_groups": 0}


def test_incremental_refresh_equals_recompute_after_update_and_delete(spark, tmp_path):
    base, view = _mk(spark, tmp_path)
    V.update_where(spark, base, F.col("p_brand") == "Brand#13",
                   {"p_size": F.col("p_size") + F.lit(100)}, now=2.0)
    V.delete_where(spark, base, F.col("p_type") == "PROMO", now=3.0)
    out = MV.refresh(spark, view, now=4.0)
    assert out["refreshed"] and out["base_version"] == 2
    assert 0 < out["affected_groups"] <= 25  # only touched brands shuffle
    assert _same(spark.read.parquet(view), _recompute(spark, base))
    assert V.history(view)[0]["operation"] == "MV_REFRESH"
    # idempotent: second refresh is a no-op
    assert MV.refresh(spark, view)["refreshed"] is False


def test_group_deleted_to_zero_disappears(spark, tmp_path):
    base, view = _mk(spark, tmp_path)
    V.delete_where(spark, base, F.col("p_brand") == "Brand#13", now=2.0)
    MV.refresh(spark, view, now=3.0)
    assert spark.read.parquet(view).where("p_brand = 'Brand#13'").count() == 0
    assert _same(spark.read.parquet(view), _recompute(spark, base))


def test_insert_only_delta_adds_new_groups(spark, tmp_path):
    base, view = _mk(spark, tmp_path)
    extra = spark.createDataFrame(
        [(99001, "Brand#NEW", "PROMO", 10), (99002, "Brand#NEW", "LARGE", 30)],
        "p_partkey long, p_brand string, p_type string, p_size int",
    )
    merged = spark.read.parquet(base).unionByName(extra)
    V.overwrite_versioned(merged, base, now=2.0)
    MV.refresh(spark, view, now=3.0)
    got = spark.read.parquet(view).where("p_brand = 'Brand#NEW'").collect()
    assert len(got) == 1 and got[0].n == 2 and got[0].sum_size == 40
    assert _same(spark.read.parquet(view), _recompute(spark, base))


def test_non_maintainable_aggregate_refused(spark, tmp_path):
    base = str(tmp_path / "b2")
    V.overwrite_versioned(spark.range(5).withColumn("g", F.lit("x")), base, now=1.0)
    with pytest.raises(ValueError, match="self-maintainable"):
        MV.create(spark, base, str(tmp_path / "v2"), key_cols=["id"],
                  group_cols=["g"], agg_specs={"m": ("max", "id")})


def test_full_refresh_mode_admits_min_max(spark, tmp_path):
    base = str(tmp_path / "fb")
    view = str(tmp_path / "fv")
    part = spark.read.parquet(f"{SF_DIR}/part.parquet").select(
        "p_partkey", "p_brand", "p_size"
    )
    V.overwrite_versioned(part, base, now=1.0)
    specs = {"n": ("count", None), "max_size": ("max", "p_size")}
    MV.create(spark, base, view, key_cols=["p_partkey"],
              group_cols=["p_brand"], agg_specs=specs, now=1.0,
              refresh_mode="full")
    # delete the current max of one brand: incremental could not repair
    # this; full mode recomputes and must land on the new max
    top = (spark.read.parquet(base).where("p_brand = 'Brand#13'")
           .orderBy(F.desc("p_size"), "p_partkey").first())
    V.delete_where(spark, base, F.col("p_partkey") == top.p_partkey, now=2.0)
    out = MV.refresh(spark, view, now=3.0)
    assert out["refreshed"]
    want = (spark.read.parquet(base).groupBy("p_brand")
            .agg(F.count(F.lit(1)).alias("n"), F.max("p_size").alias("max_size")))
    assert sorted(map(tuple, spark.read.parquet(view).select("p_brand", "n", "max_size").collect())) == \
        sorted(map(tuple, want.collect()))
    assert V.history(view)[0]["operation"] == "MV_REFRESH_FULL"


def test_incremental_mode_still_refuses_min_max(spark, tmp_path):
    base = str(tmp_path / "rb")
    V.overwrite_versioned(spark.range(5).withColumn("g", F.lit("x")), base, now=1.0)
    with pytest.raises(ValueError, match="refresh_mode='full'"):
        MV.create(spark, base, str(tmp_path / "rv"), key_cols=["id"],
                  group_cols=["g"], agg_specs={"m": ("max", "id")})


def test_sum_only_incremental_view_refused_at_create(spark, tmp_path):
    """ADVICE r8: the count-aggregate requirement must fail fast at
    create(), not after the view is built and the first refresh runs."""
    base = str(tmp_path / "sb")
    V.overwrite_versioned(spark.range(5).withColumn("g", F.lit("x")), base, now=1.0)
    with pytest.raises(ValueError, match="count aggregate"):
        MV.create(spark, base, str(tmp_path / "sv"), key_cols=["id"],
                  group_cols=["g"], agg_specs={"s": ("sum", "id")})


def test_null_group_key_folds_into_its_own_group(spark, tmp_path):
    """ADVICE r8: non-null-safe join keys left the standing NULL group
    stale and emitted a second spurious NULL row.  A NULL-keyed group
    must fold exactly like any other."""
    base = str(tmp_path / "nb")
    view = str(tmp_path / "nv")
    df = spark.createDataFrame(
        [(1, None, 10), (2, None, 20), (3, "a", 5), (4, "a", 7)],
        "id long, g string, v long",
    )
    V.overwrite_versioned(df, base, now=1.0)
    specs = {"n": ("count", None), "sv": ("sum", "v")}
    MV.create(spark, base, view, key_cols=["id"], group_cols=["g"],
              agg_specs=specs, now=1.0)
    # touch the NULL group: delete one row, update another, insert one
    V.overwrite_versioned(
        spark.createDataFrame(
            [(2, None, 25), (5, None, 30), (3, "a", 5), (4, "a", 7)],
            "id long, g string, v long",
        ),
        base, now=2.0,
    )
    out = MV.refresh(spark, view, now=3.0)
    assert out["refreshed"]
    rows = {r["g"]: (r["n"], r["sv"])
            for r in spark.read.parquet(view).collect()}
    # exactly ONE NULL-group row, fully folded: -10 (del id1) -20+25
    # (update id2) +30 (insert id5) = 55, n = 2
    assert len(rows) == 2
    assert rows[None] == (2, 55)
    assert rows["a"] == (2, 12)
    # and a NULL group deleted to zero disappears (count gate works on it)
    V.overwrite_versioned(
        spark.createDataFrame([(3, "a", 5), (4, "a", 7)],
                              "id long, g string, v long"),
        base, now=4.0,
    )
    MV.refresh(spark, view, now=5.0)
    assert {r["g"] for r in spark.read.parquet(view).collect()} == {"a"}


def test_refresh_idempotent_across_crash_before_meta_write(spark, tmp_path):
    """ADVICE r8: a crash between the view commit and the meta-sidecar
    write must NOT double-fold the same delta — the reflected base
    version rides in the view's commit entry, which is authoritative."""
    base, view = _mk(spark, tmp_path)
    V.delete_where(spark, base, F.col("p_brand") == "Brand#13", now=2.0)
    # run the refresh, then simulate the crash by restoring the STALE
    # meta sidecar (as if the process died right before writing it)
    stale_meta = MV.read_meta(view)
    assert stale_meta["base_version"] == 0
    out = MV.refresh(spark, view, now=3.0)
    assert out["refreshed"] and out["base_version"] == 1
    MV._write_meta(view, stale_meta)  # crash: sidecar never updated
    # authoritative version comes from the commit log, not the sidecar
    assert MV.reflected_base_version(view) == 1
    again = MV.refresh(spark, view, now=4.0)
    assert again == {"refreshed": False, "base_version": 1,
                     "affected_groups": 0}
    assert _same(spark.read.parquet(view), _recompute(spark, base))
