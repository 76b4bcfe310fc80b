"""UDF surface (SURVEY.md §2.10): catalog SQL UDFs + Python UDF shim.

U1 — SQL scalar UDF DDL: the reference registers
``CREATE OR REPLACE FUNCTION ...discount(p_price double) RETURNS double
LANGUAGE SQL RETURN p_price * 0.90`` (``/root/reference/Silver_Products.py:25-27``)
and calls it from SQL (``:32``) and via ``expr()`` from the DataFrame API
(``:36``, F10).  Open-source Spark ≥3.4 supports the same DDL (minus the
optional ``LANGUAGE SQL`` clause being mandatory), and **Catalyst inlines SQL
UDFs into the plan** — they cost nothing at 100 TB.

U2 — Python scalar UDF: the reference uses Databricks-only ``LANGUAGE
PYTHON`` DDL (``/root/reference/Silver_Products.py:42-47``).  OSS equivalent
is ``spark.udf.register``.  Python row-UDFs serialize every row through the
Python worker — the slow path.  ``register_python_udf`` therefore defaults to
Arrow-batched execution (``useArrow=True``), and call sites should prefer
built-ins (``F.upper``) whenever the function is expressible; the shim exists
for parity and for genuinely custom logic.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def create_sql_udf(
    spark: SparkSession,
    name: str,
    params: str,
    returns: str,
    body: str,
    replace: bool = True,
) -> None:
    """U1: register a catalog SQL UDF via DDL.

    ``create_sql_udf(spark, "discount", "p_price DOUBLE", "DOUBLE",
    "p_price * 0.90")`` mirrors ``/root/reference/Silver_Products.py:25-27``.
    """
    or_replace = "OR REPLACE " if replace else ""
    spark.sql(
        f"CREATE {or_replace}FUNCTION {name}({params}) RETURNS {returns} "
        f"RETURN {body}"
    )


def register_python_udf(
    spark: SparkSession,
    name: str,
    fn: Callable,
    return_type: str = "string",
    use_arrow: bool = True,
) -> None:
    """U2: OSS shim for the reference's ``LANGUAGE PYTHON`` DDL
    (``/root/reference/Silver_Products.py:42-47``).

    Arrow-batched by default; still prefer built-ins in hot paths.
    """
    spark.udf.register(name, F.udf(fn, return_type, useArrow=use_arrow))


def call_udf(name: str, *args: Column | str) -> Column:
    """F10: invoke a catalog UDF from the DataFrame API.

    The reference goes through ``expr("...discount(price)")``
    (``/root/reference/Silver_Products.py:36``); ``F.call_udf`` is the typed
    equivalent that skips string assembly.
    """
    cols = [F.col(a) if isinstance(a, str) else a for a in args]
    return F.call_udf(name, *cols)


def with_udf_column(df: DataFrame, out: str, name: str, *args: Column | str) -> DataFrame:
    """Attach a UDF-derived column (reference pattern ``Silver_Products.py:36``)."""
    return df.withColumn(out, call_udf(name, *args))


def register_tokenize_udtf(spark) -> None:
    """U2+ surface: a Python table function (Spark 4 UDTF) exploding text
    into (token, position, length) rows — ``SELECT * FROM tokenize(text)``.

    UDTFs are the lateral-join escape hatch when a transform genuinely
    produces a variable number of rows per input and cannot be expressed
    with explode over an array expression.  Prefer the Catalyst route
    (``F.explode(F.split(...))`` — JVM-side, whole-stage codegen) in hot
    paths: like scalar Python UDFs, a UDTF ships rows through Python.
    Registered name: ``tokenize``.
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="token: string, pos: int, length: int")
    class Tokenize:
        def eval(self, text: str):
            if text is None:
                return
            for i, tok in enumerate(text.split()):
                yield tok, i, len(tok)

    spark.udtf.register("tokenize", Tokenize)


def register_sentence_udtf(spark: SparkSession, name: str = "split_sentences"):
    """U-surface widening: a Python user-defined TABLE function (PySpark
    ≥3.5 ``@udtf``) — one input row fans out to N output rows, callable
    from SQL via lateral ``..., split_sentences(text)``.

    Same production guidance as the U2 scalar shim: a UDTF runs rows
    through the Python worker, so anything expressible as
    ``posexplode(split(...))`` should stay JVM-side — this registration
    exists for API parity (the table-function surface a reference user
    migrating custom Databricks table-UDFs needs) and for genuinely
    imperative fan-out logic.  The splitter is deliberately simple
    (``'. '`` delimiter, 0-based index) so the SQL-builtin twin and the
    DuckDB oracle replay it exactly.
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="sent_idx int, sentence string")
    class SplitSentences:
        def eval(self, text: str):  # noqa: D102 — UDTF contract method
            if text is None:
                return
            for i, s in enumerate(text.split(". ")):
                yield i, s

    spark.udtf.register(name, SplitSentences)
    return SplitSentences
