"""Generated partition columns: derived partition pruning, exact results."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from medallion_data_warehouse_on_azure_with_databricks_pyspark_spark import workload
from medallion_data_warehouse_on_azure_with_databricks_pyspark_spark.sources import generated as G

from .conftest import SF_DIR

LO, HI = "2024-01-10 06:00:00", "2024-01-12 18:00:00"


@pytest.fixture(scope="module")
def gen_table(spark):
    work = tempfile.mkdtemp(prefix="gentest_")
    t = f"{work}/events"
    ev = workload.load_events(spark, SF_DIR).select(
        "event_id", "user_id", "event_type", "value", "ts"
    )
    name = G.write_generated(ev, t, "ts", generator="date")
    assert name == "ts_date"
    return t


def _files_touched(df):
    return df.select(F.col("_metadata.file_path")).distinct().count()


def test_derived_predicate_prunes_partitions(spark, gen_table):
    pruned = G.read_generated(spark, gen_table, "ts", lower=LO, upper=HI)
    full = spark.read.parquet(gen_table)
    # 30 daily partitions; a 3-day window must touch ~3 of them
    assert _files_touched(full) >= 30
    assert _files_touched(pruned) <= 4
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "ts_date" in plan


def test_generated_scan_bit_identical_to_full_filter(spark, gen_table):
    pruned = G.read_generated(spark, gen_table, "ts", lower=LO, upper=HI)
    full = spark.read.parquet(gen_table).where(
        (F.col("ts") >= F.lit(LO)) & (F.col("ts") <= F.lit(HI))
    )
    assert sorted(map(tuple, pruned.drop("ts_date").collect())) == \
        sorted(map(tuple, full.drop("ts_date").collect()))
    assert pruned.count() > 0


def test_one_sided_and_unknown_generator(spark, gen_table):
    lo_only = G.read_generated(spark, gen_table, "ts", lower=LO)
    want = spark.read.parquet(gen_table).where(F.col("ts") >= F.lit(LO)).count()
    assert lo_only.count() == want
    with pytest.raises(ValueError, match="unknown generator"):
        G.read_generated(spark, gen_table, "ts", lower=LO, generator="nope")
    with pytest.raises(ValueError, match="no generated partition column"):
        G.read_generated(spark, gen_table, "ts", lower=LO, generator="hour")


def test_hour_generator_monotone_mapping(spark, tmp_path):
    t = str(tmp_path / "ev_hour")
    ev = workload.load_events(spark, SF_DIR).select("event_id", "ts")
    # a single day partitioned hourly: a 2-hour slice prunes hard
    day = ev.where(F.to_date("ts") == "2024-01-10")
    G.write_generated(day, t, "ts", generator="hour")
    pruned = G.read_generated(
        spark, t, "ts", lower="2024-01-10 06:00:00", upper="2024-01-10 07:59:59",
        generator="hour",
    )
    assert _files_touched(pruned) <= 3
    want = day.where(
        (F.col("ts") >= "2024-01-10 06:00:00") & (F.col("ts") <= "2024-01-10 07:59:59")
    ).count()
    assert pruned.count() == want
