"""Bucketed-table co-location: the write-time shuffle amortizes — joins and
aggregations on the bucket key run with zero Exchange."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from medallion_data_warehouse_on_azure_with_databricks_pyspark_spark.sources import (
    catalog,
    writers,
)
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def bucketed(spark):
    import shutil

    for t in ("b_orders", "b_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"spark-warehouse/{t}", ignore_errors=True)
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    lineitem = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    writers.save_bucketed_table(
        orders, "b_orders", ["o_orderkey"], 4, sort_cols=["o_orderkey"]
    )
    writers.save_bucketed_table(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "b_lineitem", ["o_orderkey"], 4, sort_cols=["o_orderkey"],
    )
    yield
    catalog.drop_table(spark, "b_orders")
    catalog.drop_table(spark, "b_lineitem")


def test_bucketed_join_has_no_exchange(spark, bucketed):
    # at test scale the dim fits the broadcast threshold and the planner
    # would skip bucketing entirely; the merge hint models the 100 TB case
    # where both sides are fact-scale
    a = spark.table("b_orders").hint("merge")
    b = spark.table("b_lineitem")
    joined = a.join(b, "o_orderkey").where(F.col("l_quantity") > 0)
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan  # co-located: write-time shuffle amortized
    # and the result is right
    expected = (
        spark.read.parquet(f"{SF_DIR}/orders.parquet")
        .join(
            spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
            .withColumnRenamed("l_orderkey", "o_orderkey"),
            "o_orderkey",
        )
        .count()
    )
    assert joined.count() == expected


def test_bucketed_aggregation_has_no_exchange(spark, bucketed):
    agg = spark.table("b_lineitem").groupBy("o_orderkey").agg(
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("q")
    )
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
