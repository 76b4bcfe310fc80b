"""Every registered workload query must match its DuckDB oracle — a local
replica of the driver's t2 correctness gate."""

from __future__ import annotations

import pytest

from medallion_data_warehouse_on_azure_with_databricks_pyspark_spark import workload

from .conftest import SF_DIR, assert_matches_oracle


def test_all_queries_have_callables():
    assert workload.QUERIES, "no queries registered"
    for name in workload.ORACLE:
        assert name in workload.QUERIES


@pytest.mark.parametrize("name", sorted(workload.ORACLE))
def test_query_matches_oracle(spark, oracle, name):
    df = workload.QUERIES[name](spark, SF_DIR)
    assert_matches_oracle(df, oracle, workload.ORACLE[name])


@pytest.mark.parametrize("name", sorted(set(workload.QUERIES) - set(workload.ORACLE)))
def test_oracle_free_query_runs(spark, name):
    df = workload.QUERIES[name](spark, SF_DIR)
    assert df.count() >= 0
