"""Bronze layer: checkpointed incremental file ingest (SURVEY.md §2.1 S1/S2,
§2.9 ST1-ST4).

Open-source parity for the reference's Auto Loader flow
(``/root/reference/Bronze_Layer.py:20-37``)::

    spark.readStream.format("cloudFiles")
        .option("cloudFiles.format", "parquet")
        .option("cloudFiles.schemaLocation", checkpoint).load(src)
    ...writeStream.format("parquet").outputMode("append")
        .option("checkpointLocation", checkpoint).trigger(once=True).start(dst)

OSS Spark's file-stream source provides the same incremental discovery +
exactly-once file-listing log, but requires a schema up front.  We replicate
Auto Loader's behavior with a one-time **schema capture**: batch-sample the
source once, pin the inferred schema as JSON at a ``schemaLocation``
directory we manage, and stream with the pinned schema thereafter
(SURVEY.md §7.4.3).  The ``_rescued_data`` column Auto Loader synthesizes for
unparseable/extra fields is materialized (NULL for schema-conforming parquet
input) so downstream silver ``drop('_rescued_data')`` behaves identically.

Run-once semantics: the reference's ``trigger(once=True)`` is deprecated
upstream; ``availableNow=True`` is the recommended equivalent — same
batchified-stream model, but it respects rate limits across multiple
micro-batches, which is the behavior you want when a backfill drops 100 TB
of files into the source prefix at once (pair with ``maxFilesPerTrigger``).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from ..operators.silver import RESCUE_COLUMN

SCHEMA_FILE = "_captured_schema.json"


def capture_schema(
    spark: SparkSession, source_dir: str, schema_location: str, fmt: str = "parquet"
) -> T.StructType:
    """ST1 support: pin the source schema (Auto Loader ``schemaLocation``
    parity, ``/root/reference/Bronze_Layer.py:22``).

    First call batch-samples the source and writes the schema JSON; later
    calls read the pin — the stream's schema never drifts under it.  At
    scale this also skips per-start footer inference over huge prefixes.
    """
    os.makedirs(schema_location, exist_ok=True)
    pin = os.path.join(schema_location, SCHEMA_FILE)
    if os.path.exists(pin):
        with open(pin) as fh:
            return T.StructType.fromJson(json.load(fh))
    schema = spark.read.format(fmt).load(source_dir).schema
    with open(pin, "w") as fh:
        json.dump(schema.jsonValue(), fh)
    return schema


def read_stream(
    spark: SparkSession,
    source_dir: str,
    schema_location: str,
    fmt: str = "parquet",
    max_files_per_trigger: int | None = None,
    add_rescue: bool = True,
) -> DataFrame:
    """S1: incremental-discovery file source with pinned schema + rescue col."""
    schema = capture_schema(spark, source_dir, schema_location, fmt)
    reader = spark.readStream.format(fmt).schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    df = reader.load(source_dir)
    if add_rescue:
        df = df.withColumn(RESCUE_COLUMN, F.lit(None).cast("string"))
    return df


def write_stream(
    df: DataFrame,
    bronze_dir: str,
    checkpoint_dir: str,
    fmt: str = "parquet",
    available_now: bool = True,
) -> StreamingQuery:
    """S2/ST2-ST4: append file sink with checkpointed exactly-once semantics
    (``/root/reference/Bronze_Layer.py:32-37``)."""
    writer = (
        df.writeStream.format(fmt)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .option("path", bronze_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def ingest(
    spark: SparkSession,
    source_dir: str,
    bronze_dir: str,
    checkpoint_dir: str,
    fmt: str = "parquet",
    max_files_per_trigger: int | None = None,
) -> None:
    """X1-parameterized run-once ingest — the whole ``Bronze_Layer`` notebook
    as one function call (``/root/reference/Bronze_Layer.py:7-37``; widget
    params become arguments).  Blocks until the available data is committed;
    re-running ingests only files the checkpoint hasn't seen (ST2)."""
    schema_location = os.path.join(checkpoint_dir, "_schema")
    df = read_stream(
        spark, source_dir, schema_location, fmt=fmt,
        max_files_per_trigger=max_files_per_trigger,
    )
    query = write_stream(df, bronze_dir, checkpoint_dir, fmt=fmt)
    query.awaitTermination()


def ingest_datasets(
    spark: SparkSession, datasets: list[dict], base_source: str, base_bronze: str,
    base_checkpoint: str,
) -> None:
    """X2: dataset fan-out (``/root/reference/parameters.py:2-19``) — each
    entry ``{"folder_name": ...}`` ingested source→bronze under its folder."""
    for item in datasets:
        folder = item["folder_name"]
        ingest(
            spark,
            os.path.join(base_source, folder),
            os.path.join(base_bronze, folder),
            os.path.join(base_checkpoint, folder),
        )
