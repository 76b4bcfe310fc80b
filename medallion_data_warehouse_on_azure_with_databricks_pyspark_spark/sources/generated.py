"""Generated partition columns: partition-prune through DERIVED columns.

Delta generated columns let a table partition on an expression of a data
column (``event_date GENERATED ALWAYS AS (DATE(ts)) PARTITIONED BY
(event_date)``) and — the part that matters at scale — derive PARTITION
filters from query predicates on the BASE column: a reader filtering
``ts BETWEEN a AND b`` prunes to partitions ``date(a)..date(b)`` without
ever mentioning ``event_date``.  Plain Spark-on-parquet gives the layout
but NOT the derivation: a ``ts`` range filter scans every partition.
This module supplies both halves:

* ``write_generated`` materializes the generated column with a
  registered MONOTONE generator (date / hour / year truncation of a
  timestamp — the class Delta supports for pruning, and monotonicity is
  exactly what makes range-predicate mapping sound) and writes
  hive-partitioned parquet;
* ``read_generated`` re-derives the partition predicate from a ``ts``
  range: for a monotone generator g, ``ts ∈ [a, b] ⇒ g(ts) ∈ [g(a),
  g(b)]``, so the partition filter ``g_col BETWEEN g(a) AND g(b)`` is
  implied and Spark's catalyst turns it into STATIC partition pruning
  (visible as ``PartitionFilters`` in the scan).  The original row-level
  predicate stays as the residual, so results are bit-identical to the
  full scan.

The generator registry is deliberately closed (no arbitrary lambdas):
soundness of the rewrite is a property of the generator, so each entry
carries its own proof obligation — exactly why Delta limits generated-
column pruning to a known expression allowlist.

Scale: static partition pruning is THE lever for time-series at 100 TB —
an hour-window query over a date-partitioned decade touches 1/3650th of
the files, and the pruning happens at planning time (no file listing of
excluded partitions on object stores that list per-prefix).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

#: generator name -> (column builder, partition value type)
GENERATORS = {
    "date": lambda c: F.to_date(c).cast("string"),
    "hour": lambda c: F.date_format(c, "yyyy-MM-dd-HH"),
    "year": lambda c: F.year(c).cast("string"),
}


def _gen_col(generator: str, col: Column) -> Column:
    try:
        return GENERATORS[generator](col)
    except KeyError:
        raise ValueError(
            f"unknown generator {generator!r} (registered: {sorted(GENERATORS)})"
        ) from None


def write_generated(
    df: DataFrame,
    path: str,
    base_col: str,
    generator: str = "date",
    gen_col: str | None = None,
) -> str:
    """Materialize ``gen_col = generator(base_col)`` and write
    hive-partitioned by it.  Returns the generated column's name.  All
    registered generators stringify their value (hive partition values
    are strings on disk anyway) and are monotone in ``base_col``."""
    name = gen_col or f"{base_col}_{generator}"
    out = df.withColumn(name, _gen_col(generator, F.col(base_col)))
    out.write.mode("overwrite").partitionBy(name).parquet(path)
    return name


def read_generated(
    spark: SparkSession,
    path: str,
    base_col: str,
    lower=None,
    upper=None,
    generator: str = "date",
    gen_col: str | None = None,
) -> DataFrame:
    """Range scan on the BASE column with the partition predicate derived
    automatically: monotone g means ``base ∈ [lower, upper]`` implies
    ``g(base) ∈ [g(lower), g(upper)]`` — the implied filter on the
    partition column prunes statically; the base-column predicate stays
    as the residual, so the result is bit-identical to a full scan."""
    if generator not in GENERATORS:
        raise ValueError(
            f"unknown generator {generator!r} (registered: {sorted(GENERATORS)})"
        )
    name = gen_col or f"{base_col}_{generator}"
    df = spark.read.parquet(path)
    if name not in df.columns:
        raise ValueError(f"{path}: no generated partition column {name!r}")
    if lower is not None:
        df = df.where(
            (F.col(name) >= _gen_col(generator, F.lit(lower)))
            & (F.col(base_col) >= F.lit(lower))
        )
    if upper is not None:
        df = df.where(
            (F.col(name) <= _gen_col(generator, F.lit(upper)))
            & (F.col(base_col) <= F.lit(upper))
        )
    return df
