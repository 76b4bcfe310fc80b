"""Multi-dimensional data layout: Z-order (Morton) clustering keys.

Delta/Databricks expose ``OPTIMIZE ... ZORDER BY (a, b)``; open-source
Spark has no equivalent, so this module provides the primitive: a Morton
key built from pure Catalyst bit arithmetic, plus a writer recipe
(``repartitionByRange`` on the key + ``sortWithinPartitions``) that yields
files whose (a, b) min/max envelopes are small and disjoint — which is
exactly what parquet row-group / file skipping needs for queries that
filter on *either or both* dimensions.

Scale notes: a single-column sort layout prunes only its leading column;
the Z-curve interleaves bits so locality is shared across dimensions.
``repartitionByRange`` samples the key distribution (one lightweight pass)
and produces equal-sized, range-disjoint files.  The key is deterministic
integer math — no UDF, no shuffle beyond the intended range partitioning.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Bits kept per dimension (2 dims × 31 bits interleave into < 63 bits, so
#: the Morton key stays a positive BIGINT).
MORTON_BITS = 31


def zorder_key(a: Column | str, b: Column | str, bits: int = MORTON_BITS) -> Column:
    """Morton (Z-order) key interleaving the low ``bits`` of two
    non-negative integral columns: bit i of ``a`` lands at position 2i,
    bit i of ``b`` at 2i+1.  Larger-than-``bits`` values are truncated to
    their low bits (callers should pre-scale/rank dimensions into range —
    percent-rank × 2^bits is the standard trick for skewed/unbounded
    domains)."""
    ca = (F.col(a) if isinstance(a, str) else a).cast("long")
    cb = (F.col(b) if isinstance(b, str) else b).cast("long")
    terms = []
    for i in range(bits):
        terms.append(F.shiftleft(F.shiftright(ca, i).bitwiseAND(F.lit(1)), 2 * i))
        terms.append(
            F.shiftleft(F.shiftright(cb, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return reduce(lambda x, y: x.bitwiseOR(y), terms)


def zorder_layout(
    df: DataFrame,
    a: str,
    b: str,
    n_files: int,
    key_col: str = "__zorder",
) -> DataFrame:
    """Cluster ``df`` into ``n_files`` range-disjoint, internally-sorted
    partitions along the (a, b) Z-curve — write the result with
    ``.write.parquet(...)`` and each output file covers a compact square-ish
    region of the (a, b) plane, so min/max skipping prunes on both columns.
    The helper key column is dropped from the returned frame's schema
    consumers see (kept internally only for the partitioning/sort)."""
    keyed = df.withColumn(key_col, zorder_key(a, b))
    return (
        keyed.repartitionByRange(n_files, F.col(key_col))
        .sortWithinPartitions(key_col)
        .drop(key_col)
    )
