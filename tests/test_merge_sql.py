"""MERGE INTO SQL surface: parser + execution against catalog tables.

The reference drives its SCD1 merge with a literal SQL string
(``/root/reference/Gold_Customers.py:75-97``) and its imperative SCD2 with
a subquery source + state-predicate ON
(``Gold_Products_No_Delta_Live.py:69-95``); both shapes must run."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from medallion_data_warehouse_on_azure_with_databricks_pyspark_spark.plans import (
    merge_sql,
)

T2 = "2024-02-01 00:00:00"

SCD1_STMT = """
  MERGE INTO gold_customer_dim AS target
  USING silver_customers_updates AS source
  ON target.customer_id = source.customer_id
    AND target.first_name = source.first_name
    AND target.last_name = source.last_name
  WHEN MATCHED AND (target.hash_value != source.hash_value) THEN
    UPDATE SET
      target.first_name = source.first_name,
      target.last_name = source.last_name,
      target.email = source.email,
      target.updated_date = current_timestamp(),
      target.change_type = 'U',
      target.hash_value = source.hash_value
  WHEN NOT MATCHED THEN
    INSERT (customer_skey, customer_id, first_name, last_name, email, created_date, updated_date, change_type, hash_value)
    VALUES (source.customer_skey, source.customer_id, source.first_name, source.last_name, source.email, current_timestamp(), current_timestamp(), 'I', source.hash_value)
"""

SCD2_STMT = """
  MERGE INTO gold_product_dim AS target
  USING (
    SELECT
      *,
      ROW_NUMBER() OVER(PARTITION BY product_id ORDER BY effective_start_date DESC) as rn
    FROM products_silver_updates
  ) AS source
  ON target.product_id = source.product_id
    AND target.is_current = true
  WHEN MATCHED AND target.hash_value != source.hash_value THEN
    UPDATE SET
      target.is_current = false,
      target.effective_end_date = current_timestamp()
  WHEN NOT MATCHED THEN
    INSERT (product_id, product_name, hash_value, effective_start_date, effective_end_date, is_current)
    VALUES (source.product_id, source.product_name, source.hash_value, current_timestamp(), NULL, true)
"""


def test_parse_reference_scd1_shape():
    spec = merge_sql.parse_merge(SCD1_STMT)
    assert spec.target == "gold_customer_dim"
    assert spec.target_alias == "target" and spec.source_alias == "source"
    assert not spec.source_is_query
    assert spec.keys == ["customer_id", "first_name", "last_name"]
    assert spec.extra_on == []
    assert spec.update_condition == "(target.hash_value != source.hash_value)"
    assert spec.update_set["change_type"] == "'U'"
    assert spec.update_set["updated_date"] == "current_timestamp()"
    assert spec.insert_values["customer_skey"] == "source.customer_skey"
    assert spec.insert_values["change_type"] == "'I'"
    assert not spec.has_delete


def test_parse_reference_scd2_shape():
    spec = merge_sql.parse_merge(SCD2_STMT)
    assert spec.source_is_query
    assert "ROW_NUMBER() OVER(PARTITION BY product_id" in spec.source
    assert spec.keys == ["product_id"]
    assert spec.extra_on == ["target.is_current = true"]
    assert spec.update_set == {
        "is_current": "false",
        "effective_end_date": "current_timestamp()",
    }
    assert spec.insert_values["effective_end_date"] == "NULL"


@pytest.fixture()
def sql_db(spark):
    import shutil

    db = "merge_sql_test"
    spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    shutil.rmtree(f"{warehouse}/{db}.db", ignore_errors=True)
    spark.sql(f"CREATE DATABASE {db}")
    yield db
    spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")


def test_merge_sql_update_insert_delete(spark, sql_db):
    tbl = f"{sql_db}.accounts"
    spark.createDataFrame(
        [(1, "alice", 10.0), (2, "bob", 20.0), (3, "carol", 30.0)],
        "id int, name string, bal double",
    ).write.saveAsTable(tbl)
    spark.createDataFrame(
        [(2, "bob", 25.0, False), (3, "carol", 0.0, True), (4, "dan", 5.0, False)],
        "id int, name string, bal double, closed boolean",
    ).createOrReplaceTempView("acct_updates")

    out = merge_sql.merge_into_sql(spark, f"""
      MERGE INTO {tbl} AS t
      USING acct_updates AS u
      ON t.id = u.id
      WHEN MATCHED AND u.closed THEN DELETE
      WHEN MATCHED THEN UPDATE SET t.bal = u.bal
      WHEN NOT MATCHED THEN INSERT (id, name, bal) VALUES (u.id, u.name, u.bal)
    """)
    rows = sorted(tuple(r) for r in out.collect())
    assert rows == [(1, "alice", 10.0), (2, "bob", 25.0), (4, "dan", 5.0)]
    # persisted: reading the table back gives the merged state
    again = sorted(tuple(r) for r in spark.read.table(tbl).collect())
    assert again == rows


def test_merge_sql_state_predicate_is_faithful_to_reference(spark, sql_db):
    """The reference's single-pass SCD2 MERGE expires a changed row but does
    NOT insert its replacement (SURVEY §7.4.1); running the literal statement
    must reproduce exactly that behavior — fidelity over correction (the
    corrected two-phase SCD2 lives in plans/scd.py)."""
    tbl = f"{sql_db}.gold_product_dim"
    spark.createDataFrame(
        [(1, "widget", "h1", True), (2, "gadget", "h2", True)],
        "product_id int, product_name string, hash_value string, is_current boolean",
    ).select(
        "product_id", "product_name", "hash_value",
        F.to_timestamp(F.lit("2024-01-01 00:00:00")).alias("effective_start_date"),
        F.lit(None).cast("timestamp").alias("effective_end_date"),
        "is_current",
    ).write.saveAsTable(tbl)
    spark.createDataFrame(
        [(1, "widget-v2", "h1b", "2024-01-15 00:00:00"),
         (3, "gizmo", "h3", "2024-01-15 00:00:00")],
        "product_id int, product_name string, hash_value string, effective_start_date string",
    ).createOrReplaceTempView("products_silver_updates")

    stmt = SCD2_STMT.replace("gold_product_dim", tbl)
    out = merge_sql.merge_into_sql(spark, stmt, now=T2)
    state = {
        (r["product_id"], r["is_current"]): r for r in out.collect()
    }
    # product 1 changed: expired in place...
    assert (1, False) in state
    assert str(state[(1, False)]["effective_end_date"]).startswith("2024-02-01")
    # ...and (faithfully to the reference's bug) no replacement row inserted.
    assert (1, True) not in state
    # product 2 untouched; product 3 brand-new -> inserted as current.
    assert (2, True) in state and state[(2, True)]["hash_value"] == "h2"
    assert (3, True) in state
    assert state[(3, True)]["effective_end_date"] is None
    assert len(state) == 3


def test_merge_sql_conditional_insert(spark, sql_db):
    """WHEN NOT MATCHED AND <cond> THEN INSERT: unmatched source rows
    failing (or NULL-ing) the condition are ignored, not inserted."""
    tbl = f"{sql_db}.cond_ins"
    spark.createDataFrame([(1, 10.0)], "id int, bal double").write.saveAsTable(tbl)
    spark.createDataFrame(
        [(1, 11.0), (2, 5.0), (3, 50.0), (4, None)],
        "id int, bal double",
    ).createOrReplaceTempView("cond_ins_src")
    out = merge_sql.merge_into_sql(spark, f"""
      MERGE INTO {tbl} t USING cond_ins_src u ON t.id = u.id
      WHEN MATCHED THEN UPDATE SET t.bal = u.bal
      WHEN NOT MATCHED AND u.bal > 20.0 THEN INSERT (id, bal) VALUES (u.id, u.bal)
    """)
    # id=2 fails the condition, id=4's NULL is "not true": both skipped.
    assert sorted(tuple(r) for r in out.collect()) == [(1, 11.0), (3, 50.0)]


def test_merge_sql_update_before_delete_first_match_wins(spark, sql_db):
    """SQL first-match-wins: a conditional UPDATE listed before an
    unconditional DELETE updates its rows; only the rest are deleted."""
    tbl = f"{sql_db}.upd_first"
    spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 30.0)], "id int, bal double"
    ).write.saveAsTable(tbl)
    spark.createDataFrame(
        [(1, 100.0), (2, 1.0)], "id int, bal double"
    ).createOrReplaceTempView("upd_first_src")
    out = merge_sql.merge_into_sql(spark, f"""
      MERGE INTO {tbl} t USING upd_first_src u ON t.id = u.id
      WHEN MATCHED AND u.bal >= 50.0 THEN UPDATE SET t.bal = u.bal
      WHEN MATCHED THEN DELETE
    """)
    # id=1 claimed by UPDATE (100 >= 50); id=2 falls through to DELETE.
    assert sorted(tuple(r) for r in out.collect()) == [(1, 100.0), (3, 30.0)]


def test_merge_sql_null_delete_condition_falls_through_to_update(spark, sql_db):
    """The advisor's exact repro: WHEN MATCHED AND t.flag = 'x' THEN DELETE
    WHEN MATCHED THEN UPDATE, with flag NULL — the NULL condition is 'not
    true', so the row must be UPDATEd, not silently deleted."""
    tbl = f"{sql_db}.null_del"
    spark.createDataFrame(
        [(1, "x", "old"), (2, None, "old")], "id int, flag string, v string"
    ).write.saveAsTable(tbl)
    spark.createDataFrame(
        [(1, "new1"), (2, "new2")], "id int, v string"
    ).createOrReplaceTempView("null_del_src")
    out = merge_sql.merge_into_sql(spark, f"""
      MERGE INTO {tbl} t USING null_del_src u ON t.id = u.id
      WHEN MATCHED AND t.flag = 'x' THEN DELETE
      WHEN MATCHED THEN UPDATE SET t.v = u.v
    """)
    assert sorted((r["id"], r["v"]) for r in out.collect()) == [(2, "new2")]


def test_merge_sql_null_update_condition_falls_through_to_delete(spark, sql_db):
    """Update-first statement order: a matched row whose UPDATE condition
    evaluates NULL is not claimed by the UPDATE clause and falls through to
    the DELETE — the composed 'AND NOT (upd)' must coalesce the NULL or the
    whole delete predicate poisons to NULL."""
    tbl = f"{sql_db}.null_upd"
    spark.createDataFrame(
        [(1, 100.0, "old"), (2, None, "old"), (3, 1.0, "old")],
        "id int, score double, v string",
    ).write.saveAsTable(tbl)
    spark.createDataFrame(
        [(1, "new1"), (2, "new2"), (3, "new3")], "id int, v string"
    ).createOrReplaceTempView("null_upd_src")
    out = merge_sql.merge_into_sql(spark, f"""
      MERGE INTO {tbl} t USING null_upd_src u ON t.id = u.id
      WHEN MATCHED AND t.score >= 50.0 THEN UPDATE SET t.v = u.v
      WHEN MATCHED THEN DELETE
    """)
    # id=1 claimed by UPDATE; id=2 (NULL score → not true) and id=3 (false)
    # both fall through to DELETE.
    assert sorted((r["id"], r["v"]) for r in out.collect()) == [(1, "new1")]


def test_merge_sql_unconditional_update_shadows_delete(spark, sql_db):
    tbl = f"{sql_db}.upd_shadow"
    spark.createDataFrame([(1, 10.0)], "id int, bal double").write.saveAsTable(tbl)
    spark.createDataFrame([(1, 99.0)], "id int, bal double").createOrReplaceTempView(
        "upd_shadow_src"
    )
    out = merge_sql.merge_into_sql(spark, f"""
      MERGE INTO {tbl} t USING upd_shadow_src u ON t.id = u.id
      WHEN MATCHED THEN UPDATE SET t.bal = u.bal
      WHEN MATCHED THEN DELETE
    """)
    assert [tuple(r) for r in out.collect()] == [(1, 99.0)]


def test_merge_sql_swapped_reserved_aliases(spark, sql_db):
    """target AS s / source AS t: the single-pass alias rewrite must not
    clobber itself (a sequential rewrite maps s.→t.→s., corrupting every
    target reference)."""
    tbl = f"{sql_db}.swapped"
    spark.createDataFrame([(1, "old"), (2, "keep")], "k int, v string").write.saveAsTable(tbl)
    spark.createDataFrame([(1, "new"), (3, "ins")], "k int, v string").createOrReplaceTempView(
        "swapped_src"
    )
    out = merge_sql.merge_into_sql(spark, f"""
      MERGE INTO {tbl} AS s USING swapped_src AS t ON s.k = t.k
      WHEN MATCHED AND s.v != t.v THEN UPDATE SET s.v = t.v
      WHEN NOT MATCHED THEN INSERT (k, v) VALUES (t.k, t.v)
    """)
    assert sorted(tuple(r) for r in out.collect()) == [(1, "new"), (2, "keep"), (3, "ins")]


def test_merge_sql_insert_star_and_update_star(spark, sql_db):
    tbl = f"{sql_db}.kv"
    spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string").write.saveAsTable(tbl)
    spark.createDataFrame([(2, "B"), (3, "C")], "k int, v string").createOrReplaceTempView("kv_src")
    out = merge_sql.merge_into_sql(spark, f"""
      MERGE INTO {tbl} t USING kv_src s ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED THEN INSERT *
    """)
    assert sorted(tuple(r) for r in out.collect()) == [(1, "a"), (2, "B"), (3, "C")]
