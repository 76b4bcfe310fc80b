"""Stream-stream interval join: batch-mode equivalence + shape contracts."""

from __future__ import annotations

from pyspark.sql import functions as F

from medallion_data_warehouse_on_azure_with_databricks_pyspark_spark.streaming import join_stream as sj

from .conftest import SF_DIR


def _events(spark):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    if dict(ev.dtypes)["ts"] == "bigint":
        ev = ev.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return ev


def test_interval_join_matches_sql_join(spark):
    ev = _events(spark)
    views = ev.where(F.col("event_type") == "view").select(
        F.col("event_id").alias("vid"), "user_id", F.col("ts").alias("vts")
    )
    buys = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"), "user_id", F.col("ts").alias("pts")
    )
    got = sj.interval_join(
        views, buys, key="user_id", left_ts="vts", right_ts="pts",
        lower="0 seconds", upper="1 hour",
    )
    ev.createOrReplaceTempView("ev_ssj")
    want = spark.sql(
        """
        SELECT v.user_id, v.event_id AS vid, v.ts AS vts,
               p.event_id AS pid, p.ts AS pts
        FROM ev_ssj v JOIN ev_ssj p
          ON v.user_id = p.user_id
         AND v.event_type = 'view' AND p.event_type = 'purchase'
         AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 1 HOUR
        """
    )
    assert sorted(map(tuple, got.select("user_id", "vid", "vts", "pid", "pts").collect())) == \
        sorted(map(tuple, want.collect()))
    assert got.count() > 0  # the lane exercises a non-trivial match set


def test_interval_join_key_appears_once(spark):
    ev = _events(spark)
    views = ev.limit(10).select(F.col("event_id").alias("vid"), "user_id",
                                F.col("ts").alias("vts"))
    buys = ev.limit(10).select(F.col("event_id").alias("pid"), "user_id",
                               F.col("ts").alias("pts"))
    out = sj.interval_join(views, buys, key="user_id", left_ts="vts", right_ts="pts")
    assert out.columns == ["user_id", "vid", "vts", "pid", "pts"]


def test_interval_join_extra_condition(spark):
    ev = _events(spark)
    views = ev.where(F.col("event_type") == "view").select(
        F.col("event_id").alias("vid"), "user_id", F.col("ts").alias("vts"),
        F.col("value").alias("vval"),
    )
    buys = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"), "user_id", F.col("ts").alias("pts"),
        F.col("value").alias("pval"),
    )
    base = sj.interval_join(views, buys, key="user_id", left_ts="vts", right_ts="pts")
    gated = sj.interval_join(
        views, buys, key="user_id", left_ts="vts", right_ts="pts",
        extra_condition=F.col("r.pval") > F.col("l.vval"),
    )
    assert gated.count() == base.where(F.col("pval") > F.col("vval")).count()


def test_interval_join_left_outer_batch(spark):
    ev = _events(spark)
    views = ev.where(F.col("event_type") == "view").select(
        F.col("event_id").alias("vid"), "user_id", F.col("ts").alias("vts")
    )
    buys = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"), "user_id", F.col("ts").alias("pts")
    )
    inner = sj.interval_join(views, buys, key="user_id", left_ts="vts",
                             right_ts="pts", how="inner")
    outer = sj.interval_join(views, buys, key="user_id", left_ts="vts",
                             right_ts="pts", how="left_outer")
    # every view appears; unmatched ones carry NULL purchase columns
    matched_vids = {r.vid for r in inner.select("vid").distinct().collect()}
    assert outer.where(F.col("pid").isNull()).count() == views.count() - len(matched_vids)
    assert outer.count() == inner.count() + views.count() - len(matched_vids)
