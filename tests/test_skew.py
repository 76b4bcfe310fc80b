"""Skew-mitigation operators: salting must be semantically invisible."""

from __future__ import annotations

from pyspark.sql import functions as F

from medallion_data_warehouse_on_azure_with_databricks_pyspark_spark.operators import (
    skew,
)

SF = "/root/testdata/sf0.001"


def test_salted_group_agg_equals_direct(spark):
    df = spark.read.parquet(f"{SF}/lineitem.parquet")
    salted = skew.salted_group_agg(
        df,
        ["l_returnflag"],
        [
            ("sum_qty", F.col("l_quantity").cast("decimal(18,2)"), "sum"),
            ("n", "l_orderkey", "count"),
            ("min_ship", "l_shipdate", "min"),
            ("max_ship", "l_shipdate", "max"),
        ],
        salt_from="l_orderkey",
        buckets=7,
    )
    direct = df.groupBy("l_returnflag").agg(
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("sum_qty"),
        F.count("l_orderkey").alias("n"),
        F.min("l_shipdate").alias("min_ship"),
        F.max("l_shipdate").alias("max_ship"),
    )
    key = lambda rows: sorted(tuple(r) for r in rows)  # noqa: E731
    assert key(salted.collect()) == key(direct.collect())


def test_salted_group_agg_rejects_non_algebraic(spark):
    df = spark.range(10)
    try:
        skew.salted_group_agg(df, ["id"], [("a", "id", "avg")], salt_from="id")
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_salted_join_equals_plain_join(spark):
    lineitem = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    part = spark.read.parquet(f"{SF}/part.parquet").select(
        F.col("p_partkey").alias("l_partkey"), "p_name"
    )
    salted = skew.salted_join(
        lineitem, part, "l_partkey", salt_from="l_orderkey", buckets=5
    )
    plain = lineitem.join(part, "l_partkey")
    assert salted.count() == plain.count()
    key = lambda df: sorted(  # noqa: E731
        tuple(r) for r in df.select("l_partkey", "l_orderkey", "p_name").collect()
    )
    assert key(salted) == key(plain)
    # left join parity incl. unmatched rows
    some = part.filter(F.col("l_partkey") % 2 == 0)
    s = skew.salted_join(lineitem, some, "l_partkey", "l_orderkey", 3, how="left")
    p = lineitem.join(some, "l_partkey", "left")
    assert s.count() == p.count()
