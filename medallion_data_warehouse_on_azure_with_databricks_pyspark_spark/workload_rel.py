"""Relational-surface widening queries (round 2): pivot, cube,
semi/anti joins, analytic window functions, string functions.

Each entry exercises a Spark relational capability a reference user would
reach for next, with a bit-exact DuckDB oracle.  Determinism: counts are
exact integers; money sums go through DECIMAL(18,2); percent_rank /
cume_dist are integer-ratio doubles (identical division on both engines);
every window order carries a unique tie-breaker.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .workload import load, query

_YEARS = list(range(1995, 2002))


@query(
    "orders_year_priority_pivot",
    oracle=f"""
    SELECT o_orderpriority,
           {", ".join(f'''count(*) FILTER (year(o_orderdate) = {y}) AS "y{y}"'''
                      for y in _YEARS)}
    FROM orders GROUP BY o_orderpriority
    """,
)
def orders_year_priority_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: order counts per priority × year.  Pivot values are given
    explicitly — at 100 TB an implicit pivot runs an extra distinct pass
    over the pivot column *and* risks a column explosion; pinning the
    domain keeps it one partial-aggregated shuffle with a fixed schema."""
    orders = load(spark, sf_dir, "orders")
    out = (
        orders.withColumn("year", F.year("o_orderdate"))
        .groupBy("o_orderpriority")
        .pivot("year", _YEARS)
        .count()
    )
    # Spark pivot yields NULL for empty cells; SQL's count FILTER yields 0
    return out.select(
        "o_orderpriority",
        *[
            F.coalesce(F.col(str(y)), F.lit(0)).cast("long").alias(f"y{y}")
            for y in _YEARS
        ],
    )


@query(
    "orders_status_priority_cube",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(grouping(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
           count(*) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def orders_status_priority_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE with grouping-id disambiguation (extends the ROLLUP coverage in
    ``orders_priority_rollup``): all four aggregation lattices in one
    partial-aggregated pass — Spark expands grouping sets map-side, so the
    shuffle carries one partial row per (set, group), not 4× the input."""
    orders = load(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping_id().cast("long").alias("gid"),
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_price"),
        )
        .select(
            "o_orderstatus", "o_orderpriority", "gid", "n_orders", "total_price"
        )
    )


@query(
    "customer_without_orders",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 450000)
    """,
)
def customer_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join (NOT EXISTS): customers with no high-value order (the
    driver's keys are dense, so the unpredicated anti-join is empty — the
    price predicate keeps the check meaningful).  The probe-side filter
    pushes to the orders scan, and the anti join shuffles only the pruned
    ``o_custkey`` column — never full rows."""
    customer = load(spark, sf_dir, "customer")
    orders = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 450000)
        .select("o_custkey")
    )
    return customer.join(
        orders, customer["c_custkey"] == orders["o_custkey"], "left_anti"
    ).select("c_custkey", "c_name", "c_mktsegment")


@query(
    "customer_with_high_value_orders",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
    """,
)
def customer_with_high_value_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join (EXISTS) with a pushed-down probe-side filter: the
    ``o_totalprice`` predicate reaches the orders parquet scan before the
    join, and the semi join deduplicates matches without a distinct."""
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return customer.join(
        orders, customer["c_custkey"] == orders["o_custkey"], "left_semi"
    ).select("c_custkey", "c_name")


@query(
    "orders_analytic_windows",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice,
           lag(o_totalprice) OVER w AS prev_price,
           lead(o_totalprice) OVER w AS next_price,
           percent_rank() OVER w AS pct_rank,
           cume_dist() OVER w AS cdist,
           ntile(4) OVER w AS quartile
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def orders_analytic_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic window pack — lag/lead/percent_rank/cume_dist/ntile over
    one shared per-customer window spec, so Catalyst plans a single
    exchange + single sort + single Window node for all five functions."""
    from pyspark.sql import Window

    orders = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cdist"),
        F.ntile(4).over(w).alias("quartile"),
    )


@query(
    "part_string_functions",
    oracle="""
    SELECT p_partkey,
           upper(substr(p_name, 1, 1)) || substr(p_name, 2) AS name_cap,
           lpad(p_brand, 12, '*') AS brand_padded,
           replace(p_type, 'ANODIZED', 'COATED') AS type_replaced,
           reverse(p_type) AS type_rev,
           strpos(p_type, 'BRUSHED') AS brushed_pos,
           levenshtein(p_brand, p_type) AS brand_type_dist
    FROM part
    """,
)
def part_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-function pack (capitalize/lpad/replace/reverse/locate/
    levenshtein) — all JVM-side Catalyst expressions in one Project; the
    scan reads only the referenced columns."""
    part = load(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.concat(
            F.upper(F.substring("p_name", 1, 1)),
            F.expr("substring(p_name, 2)"),
        ).alias("name_cap"),
        F.lpad("p_brand", 12, "*").alias("brand_padded"),
        F.replace(F.col("p_type"), F.lit("ANODIZED"), F.lit("COATED")).alias(
            "type_replaced"
        ),
        F.reverse(F.col("p_type")).alias("type_rev"),
        F.instr(F.col("p_type"), "BRUSHED").cast("long").alias("brushed_pos"),
        F.levenshtein(F.col("p_brand"), F.col("p_type")).cast("long").alias(
            "brand_type_dist"
        ),
    )


@query(
    "events_variant_props",
    oracle="""
    SELECT event_id,
           CAST(props->>'k' AS BIGINT) AS k_val,
           CAST(props->>'k' AS BIGINT) % 10 AS k_bucket
    FROM events
    """,
)
def events_variant_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured JSON via Spark 4 VARIANT (``parse_json`` +
    ``try_variant_get``): the open-format answer to schema-on-read JSON at
    scale — the variant binary encoding is columnar-shreddable, so path
    extraction does not re-parse text per access (unlike
    ``get_json_object``, which this complements in ``events_json_props``)."""
    from .workload import load_events

    ev = load_events(spark, sf_dir)
    v = ev.select(
        "event_id", F.parse_json(F.col("props")).alias("v")
    )
    return v.select(
        "event_id",
        F.try_variant_get("v", "$.k", "long").alias("k_val"),
        (F.try_variant_get("v", "$.k", "long") % 10).alias("k_bucket"),
    )


@query(
    "orders_unpivot_metrics",
    oracle="""
    WITH wide AS (
      SELECT o_orderpriority,
             CAST(count(*) AS DOUBLE) AS n_orders,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS total_price,
             CAST(max(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS max_price
      FROM orders GROUP BY o_orderpriority)
    SELECT o_orderpriority, 'n_orders' AS metric, n_orders AS value FROM wide
    UNION ALL
    SELECT o_orderpriority, 'total_price', total_price FROM wide
    UNION ALL
    SELECT o_orderpriority, 'max_price', max_price FROM wide
    """,
)
def orders_unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (``DataFrame.unpivot`` → ``Expand`` node): the wide
    per-priority aggregate melted to ``(priority, metric, value)`` long
    form — the report/export shape.  Expand multiplies rows map-side
    (zero extra shuffle beyond the aggregation); value columns unify to
    DOUBLE, exact for counts and the DECIMAL-summed money columns."""
    orders = load(spark, sf_dir, "orders")
    wide = orders.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("double").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("total_price"),
        F.max(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("max_price"),
    )
    return wide.unpivot(
        ["o_orderpriority"],
        ["n_orders", "total_price", "max_price"],
        "metric",
        "value",
    )


# ---------------------------------------------------------------------------
# Multi-join analytics (round 10): the TPC-H Q3/Q5 join shapes — the star
# schema exercised THROUGH the fact table, not just dim-enrichment
# ---------------------------------------------------------------------------

_REVENUE = """CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE)"""


@query(
    "orders_shipping_priority",
    oracle=f"""
    SELECT l_orderkey,
           {_REVENUE} AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_shipdate  > TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def orders_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape (shipping priority): segment-filtered customers ⋈
    orders ⋈ lineitem, revenue per undelivered order, global top-10.

    Scale plan: the customer side is filtered FIRST (predicate reaches
    the parquet scan) and broadcast into orders — one fact-side shuffle
    on ``l_orderkey``/``o_orderkey`` for the big join + aggregation; the
    top-10 is TakeOrderedAndProject (no global sort materialization).
    Revenue goes through DECIMAL(18,2) so the sum is order-independent
    and the DESC ranking deterministic (ties break on l_orderkey)."""
    cust = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp")
    )
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01 00:00:00").cast("timestamp")
    )
    rev = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1) - F.col("l_discount")).cast("decimal(18,2)")
    )
    return (
        li.join(
            orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey),
            li.l_orderkey == orders.o_orderkey,
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


@query(
    "regional_nation_revenue",
    oracle=f"""
    SELECT n_name, {_REVENUE} AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
)
def regional_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape (local supplier volume): the six-table star join —
    region → nation → supplier pruned FIRST (the broadcast dim chain
    collapses to a small supplier set before any fact bytes move), then
    lineitem ⋈ orders ⋈ customer with the local-supplier condition
    ``c_nationkey = s_nationkey`` applied as a join conjunct, revenue per
    nation.

    Scale plan: exactly one shuffle of lineitem (on l_orderkey) and one
    of orders/customer each; nation/region/supplier ride broadcasts.
    Catalyst pushes ``r_name = 'ASIA'`` through the chain so the
    supplier broadcast carries only the region's suppliers."""
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load(spark, sf_dir, "nation").join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    )
    supp = load(spark, sf_dir, "supplier").join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    )
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    rev = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1) - F.col("l_discount")).cast("decimal(18,2)")
    )
    return (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(
            cust,
            (orders.o_custkey == cust.c_custkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .groupBy("n_name")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


# ---------------------------------------------------------------------------
# Bucketed co-location (round 10): the write-time-shuffle join
# ---------------------------------------------------------------------------

#: sf_dirs whose bucketed twins already exist in this process's warehouse
#: (build-once guard, same bounded-cache argument as the ANN index lanes:
#: one entry per sf_dir, never per query run).
_BUCKETED_SF: set[str] = set()


def _ensure_bucketed_tables(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Build-once bucketed catalog twins of orders/customer, hash-clustered
    into 8 buckets on the customer key (sorted within buckets).  The
    bucket shuffle is paid HERE, at write time — every later join or
    aggregation on the key runs exchange-free, which is the point of
    bucketing a 100 TB fact table that is joined on the same key daily.

    Re-run safe across processes: a MANAGED table's location
    (``<warehouse>/bkt_*``) survives the JVM, while the in-memory catalog
    of a fresh session does not — a bare ``saveAsTable`` then raises
    ``LOCATION_ALREADY_EXISTS``.  Before the build we DROP any cataloged
    twin *and* delete a stale orphaned location, so every process
    converges on its own freshly-written buckets."""
    import hashlib
    import shutil

    from .sources import writers

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    t_orders, t_cust = f"bkt_orders_{tag}", f"bkt_customer_{tag}"
    if sf_dir not in _BUCKETED_SF:
        warehouse = spark.conf.get(
            "spark.sql.warehouse.dir", "spark-warehouse"
        ).removeprefix("file:")
        for name in (t_orders, t_cust):
            spark.sql(f"DROP TABLE IF EXISTS {name}")
            stale = os.path.join(warehouse, name)
            if os.path.exists(stale):
                shutil.rmtree(stale, ignore_errors=True)
        writers.save_bucketed_table(
            load(spark, sf_dir, "orders"),
            t_orders, ["o_custkey"], 8, sort_cols=["o_custkey"],
        )
        writers.save_bucketed_table(
            load(spark, sf_dir, "customer"),
            t_cust, ["c_custkey"], 8, sort_cols=["c_custkey"],
        )
        _BUCKETED_SF.add(sf_dir)
    return t_orders, t_cust


@query(
    "orders_bucketed_colocated_join",
    oracle="""
    SELECT c_mktsegment,
           count(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS total_price
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
)
def orders_bucketed_colocated_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-located bucket join: orders ⋈ customer on the bucket key with
    ZERO join-side Exchange — both tables were hash-clustered into the
    same bucket layout at write time (``sources/writers.py
    save_bucketed_table``), so the sort-merge join reads matching buckets
    pairwise.  The ``merge`` hint models the 100 TB case where both
    sides are fact-scale and no broadcast exists; the only exchange in
    the plan is the final skinny per-segment aggregate.
    ``tests/test_plans.py`` pins the no-join-exchange shape."""
    t_orders, t_cust = _ensure_bucketed_tables(spark, sf_dir)
    o = spark.table(t_orders).hint("merge")
    c = spark.table(t_cust)
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_price"),
        )
    )
