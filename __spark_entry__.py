"""Driver contract for the spark-graft builder (PySpark target).

Thin wrapper over the engine's workload registry
(``medallion_data_warehouse_on_azure_with_databricks_pyspark_spark.workload``):
``queries()`` / ``oracle_sql()`` expose one entry per implemented operator
from SURVEY.md §2, and ``entry()`` runs the flagship silver query at sf0.001.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from medallion_data_warehouse_on_azure_with_databricks_pyspark_spark import (  # noqa: E402
    workload,
)

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The reference's first end-to-end silver flow (domain group-count,
    ``/root/reference/Silver_Customers.py:12-28``) on the driver's customer
    table.
    """
    return workload.QUERIES["customer_segment_count"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2, in
    CORRECTNESS_PRIORITY order (the driver's 50-entry window consumes the
    front of this dict — see workload.py's rotation policy)."""
    return workload.ordered_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted for non-SQL-expressible
    ops).  DRIVER_RETIRED lanes are excluded to mirror ``queries()`` —
    their oracles still run at both SFs every pytest suite run
    (tests/test_workload_oracle.py iterates the FULL workload.ORACLE)."""
    return {
        n: sql for n, sql in workload.ORACLE.items()
        if n not in workload.DRIVER_RETIRED
    }
