"""Query registry: every implemented operator as a named (query, oracle) pair.

This is the engine's correctness surface.  Each entry maps a SURVEY.md §2
operator (or extension operator) onto the driver's synthetic star schema
(``/root/testdata/sf*/``, see FIXTURES.md §B) as:

* a Spark callable ``(spark, sf_dir) -> DataFrame`` built from the engine's
  operator library, and
* an equivalent ANSI-SQL string for the DuckDB oracle (omitted only for
  genuinely non-SQL-expressible ops — streaming, nondeterministic ids).

Determinism rules (both sides must agree bit-for-bit on the value hash):

* Money aggregations go through ``DECIMAL(18,2)`` (exact) and cast the final
  result to double — float summation order differs between engines, decimals
  don't.
* Every window order has a unique tie-breaker column.
* Column names are aliased identically on both sides (driver sorts columns
  by name before hashing).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions import hashing
from .operators import aggregates, joins, silver, windows

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    """S3: batch parquet scan (``/root/reference/Silver_Customers.py:12-13``)."""
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


def query(name: str, oracle: str | None = None):
    """Register a workload query (and its DuckDB oracle, if expressible)."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


# ---------------------------------------------------------------------------
# Silver: cleanse / derive / filter / aggregate  (SURVEY §2.2, §2.4, §2.6-2.7)
# ---------------------------------------------------------------------------

@query(
    "customer_segment_count",
    oracle="""
    SELECT c_mktsegment, count(c_custkey) AS total_customers
    FROM customer GROUP BY c_mktsegment
    ORDER BY total_customers DESC, c_mktsegment
    """,
)
def customer_segment_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 + O1: group-count ordered desc — the reference's domain-count
    exploration (``/root/reference/Silver_Customers.py:28``) keyed on the
    driver schema's ``c_mktsegment``."""
    df = silver.clean_columns(load(spark, sf_dir, "customer"))
    out = aggregates.group_count(df, "c_mktsegment", "c_custkey", "total_customers")
    return aggregates.sort(out, ("total_customers", True), ("c_mktsegment", False))


@query(
    "customer_filter_segment",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer WHERE c_mktsegment = 'BUILDING'
    """,
)
def customer_filter_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6 + P4: pushdown-able equality filter + narrow projection
    (``/root/reference/Silver_Customers.py:32``)."""
    df = load(spark, sf_dir, "customer")
    df = silver.filter_eq(df, "c_mktsegment", "BUILDING")
    return silver.project(df, "c_custkey", "c_name", "c_mktsegment")


@query(
    "part_type_token_count",
    oracle="""
    SELECT split_part(p_type, ' ', 1) AS type_class,
           count(p_partkey) AS total_parts
    FROM part GROUP BY type_class
    ORDER BY total_parts DESC, type_class
    """,
)
def part_type_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1 + A2: split-then-index derivation feeding a group-count — the
    reference's e-mail-domain flow (``/root/reference/Silver_Customers.py:23-28``)
    mapped onto ``p_type`` (FIXTURES.md: driver tables have no email col)."""
    df = load(spark, sf_dir, "part")
    df = silver.split_domain(df, "p_type", out="type_class", delim=" ", index=0)
    out = aggregates.group_count(df, "type_class", "p_partkey", "total_parts")
    return aggregates.sort(out, ("total_parts", True), ("type_class", False))


@query(
    "customer_change_hash",
    oracle="""
    SELECT c_custkey,
           c_name || ' ' || c_mktsegment AS fullname,
           sha256(c_name || c_mktsegment || CAST(c_nationkey AS VARCHAR))
             AS hash_value
    FROM customer
    """,
)
def customer_change_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2 + F7: null-propagating concat + sha2-256 change-detection hash
    (``/root/reference/Gold_Customers.py:36-48``)."""
    df = load(spark, sf_dir, "customer")
    df = silver.concat_columns(df, "fullname", F.col("c_name"), F.lit(" "), F.col("c_mktsegment"))
    df = hashing.change_hash(df, ["c_name", "c_mktsegment", "c_nationkey"])
    return silver.project(df, "c_custkey", "fullname", "hash_value")


# ---------------------------------------------------------------------------
# Windows  (SURVEY §2.5)
# ---------------------------------------------------------------------------

_ORDERS_WINDOW_SQL = """
    SELECT o_orderkey,
           year(o_orderdate) AS order_year,
           o_totalprice,
           rank()       OVER w AS price_rank,
           dense_rank() OVER w AS price_dense_rank,
           row_number() OVER w AS price_row_number
    FROM orders
    WINDOW w AS (PARTITION BY year(o_orderdate)
                 ORDER BY o_totalprice DESC, o_orderkey)
"""


@query("orders_year_windows", oracle=_ORDERS_WINDOW_SQL)
def orders_year_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4/F5 + W1-W3/W6: year derivation, then rank/dense_rank/row_number over
    one shared window spec — one shuffle + one sort for all three
    (``/root/reference/Silver_Orders.py:38-96``).  ``o_orderkey`` tie-break
    keeps row_number deterministic (the reference orders by amount only)."""
    df = load(spark, sf_dir, "orders")
    df = silver.derive_year(df, "o_orderdate", out="order_year")
    df = windows.ranked_all(
        df, ["order_year"], [("o_totalprice", True), ("o_orderkey", False)], prefix="price_"
    )
    return silver.project(
        df,
        "o_orderkey",
        "order_year",
        "o_totalprice",
        F.col("price_rank"),
        F.col("price_dense_rank"),
        F.col("price_row_number"),
    )


@query(
    "orders_duplicate_custkeys",
    oracle="""
    SELECT o_custkey, row_no FROM (
      SELECT o_custkey,
             row_number() OVER (PARTITION BY o_custkey ORDER BY o_custkey) AS row_no
      FROM orders) WHERE row_no > 1
    """,
)
def orders_duplicate_custkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4 + P7: window-based duplicate detector
    (``/root/reference/Gold_Customers.py:2-7``).  Projects only (key, row_no):
    which physical row gets which row_no is nondeterministic under ties, the
    (key, row_no) *set* is deterministic."""
    df = load(spark, sf_dir, "orders")
    dup = windows.duplicates(df, ["o_custkey"], out="row_no")
    return silver.project(dup, "o_custkey", "row_no")


# ---------------------------------------------------------------------------
# Aggregation beyond count + joins  (SURVEY §2.3-2.4 extended surface)
# ---------------------------------------------------------------------------

@query(
    "lineitem_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
             / COUNT(*) AS avg_qty,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def lineitem_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary: the full agg surface (sum/avg/count)
    the engine exposes beyond the reference's count-only usage (SURVEY §2.4).
    Partial+final hash aggregate; decimal-exact money math (determinism rule).
    """
    df = load(spark, sf_dir, "lineitem")
    df = df.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
    qty = F.col("l_quantity").cast("decimal(18,2)")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = (F.lit(1) - F.col("l_discount")).cast("decimal(18,2)")
    out = (
        df.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).cast("double").alias("sum_qty"),
            F.sum(price).cast("double").alias("sum_base_price"),
            F.sum(price * disc).cast("double").alias("sum_disc_price"),
            (F.sum(qty).cast("double") / F.count(F.lit(1))).alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )
    return out.orderBy("l_returnflag", "l_linestatus")


@query(
    "fact_enrichment_join",
    oracle="""
    SELECT l.l_orderkey, l.l_linenumber, o.o_custkey, o.o_orderstatus,
           p.p_name, p.p_brand, s.s_name,
           l.l_extendedprice * (1 - l.l_discount) AS revenue
    FROM lineitem l
    LEFT JOIN orders   o ON l.l_orderkey = o.o_orderkey
    LEFT JOIN part     p ON l.l_partkey  = p.p_partkey
    LEFT JOIN supplier s ON l.l_suppkey  = s.s_suppkey
    """,
)
def fact_enrichment_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1/J2: star-schema fact enrichment — chained left equi-joins to dims
    with explicit broadcast (``/root/reference/Gold_Orders.py:36-37``).
    Row-level floats only (no reordering), so values are bit-exact."""
    lineitem = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders").withColumnRenamed("o_orderkey", "l_orderkey")
    part = load(spark, sf_dir, "part").withColumnRenamed("p_partkey", "l_partkey")
    supplier = load(spark, sf_dir, "supplier").withColumnRenamed("s_suppkey", "l_suppkey")
    fact = joins.enrich(
        lineitem,
        [(orders, "l_orderkey"), (part, "l_partkey"), (supplier, "l_suppkey")],
    )
    fact = fact.withColumn(
        "revenue", F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    )
    return silver.project(
        fact,
        "l_orderkey", "l_linenumber", "o_custkey", "o_orderstatus",
        "p_name", "p_brand", "s_name", "revenue",
    )
