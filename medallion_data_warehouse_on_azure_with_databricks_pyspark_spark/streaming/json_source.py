"""JSON-lines streaming source with full Auto Loader rescue semantics
(SURVEY.md §2.1 S1, §2.9 ST1; VERDICT r6 "What's missing" #5).

The parquet bronze source (``streaming/bronze.py``) rescues *new* columns
but documents type *changes* of pinned columns as out of scope — parquet's
column reader enforces the pinned physical type, so an incompatible file
hard-fails the batch.  Text-encoded sources (JSON/CSV) are different: the
raw lexical value is still present in the file, so Auto Loader's
``rescuedDataColumn`` captures **both** drift kinds per row:

* a pinned column whose value no longer parses as the pinned type
  (``{"value": "N/A"}`` under ``value DOUBLE``) → column is NULL, the raw
  lexeme lands in ``_rescued_data``;
* a key absent from the pin → raw lexeme lands in ``_rescued_data``;
* a line that is not a JSON object at all → the whole line lands under
  ``_corrupt_record`` inside ``_rescued_data``.

Design (all Catalyst expressions, zero UDFs, zero shuffles — a pure
projection over the text stream, so it scales exactly like the scan):

1. stream the files with the ``text`` source (same incremental-discovery +
   exactly-once file log as every other file stream);
2. ``from_json(line, map<string,string>)`` — Jackson preserves each
   scalar's lexical form (``4.0`` stays ``"4.0"``) and stringifies nested
   objects/arrays to their JSON text, so no information is lost before
   typing;
3. per pinned field, ``try_cast`` the lexeme to the pinned type; a
   non-NULL lexeme whose cast fails is a type-change → rescue;
4. ``map_filter`` the parsed map for keys outside the pin → rescue;
5. ``to_json`` over the concatenated rescue map (NULL when empty), so the
   downstream contract is byte-identical to the parquet bronze lane's
   ``_rescued_data``.

Scope: flat JSON objects, one per line (the NDJSON landing-zone shape).
Nested *values* are fine — an unexpected nested object is rescued as its
JSON text — but the pin itself must be scalar-typed; declaring a nested
pinned field raises.

Oracle note: every step is deterministic string/cast arithmetic, so the
registered lane (``events_json_rescue_ingest``) is fully DuckDB-replayable
— the only cross-engine hazard is ``TRY_CAST`` disagreement on marginal
lexemes (DuckDB rounds ``'3.7'`` to INTEGER 4, Spark yields NULL), which
the lane avoids by corrupting with non-numeric lexemes.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.silver import RESCUE_COLUMN

#: Rescue-map key for lines that are not JSON objects at all (Auto Loader
#: uses the same reserved name for its corrupt-record capture).
CORRUPT_KEY = "_corrupt_record"

_RAW = "__json_raw_line"


def _validate_pin(pinned: T.StructType) -> None:
    for f in pinned.fields:
        if isinstance(f.dataType, (T.StructType, T.ArrayType, T.MapType)):
            raise ValueError(
                f"pinned field {f.name!r} is nested ({f.dataType.simpleString()}); "
                "the JSON rescue source pins scalar fields only — nested "
                "payloads belong in a string column (rescued or declared)"
            )


def parse_json_with_rescue(
    lines: DataFrame, pinned: T.StructType, line_col: str = "value"
) -> DataFrame:
    """Project a one-JSON-object-per-line text frame onto ``pinned`` +
    ``_rescued_data`` (the whole contract in one Catalyst projection).

    Works identically on batch and streaming frames — the registered lane
    streams it, the unit tests drive it both ways.
    """
    _validate_pin(pinned)
    pinned_names = [f.name for f in pinned.fields]
    raw_line = F.col(_RAW)
    m = F.from_json(raw_line, "map<string,string>")

    typed: dict[str, F.Column] = {}
    bad_entries = []
    for f in pinned.fields:
        lexeme = m[f.name]
        if isinstance(f.dataType, T.StringType):
            # a string column accepts any scalar lexeme — never a mismatch
            typed[f.name] = lexeme
            continue
        cast = lexeme.try_cast(f.dataType)
        typed[f.name] = cast
        bad_entries.append(
            F.when(
                lexeme.isNotNull() & cast.isNull(),
                F.struct(F.lit(f.name).alias("key"), lexeme.alias("value")),
            )
        )

    if bad_entries:
        bad_map = F.map_from_entries(
            F.filter(F.array(*bad_entries), lambda e: e.isNotNull())
        )
    else:
        bad_map = F.create_map().cast("map<string,string>")
    unknown_map = F.map_filter(
        m,
        lambda k, _v: reduce(
            lambda acc, n: acc & (k != F.lit(n)), pinned_names, F.lit(True)
        ),
    )
    rescued_map = F.map_concat(bad_map, unknown_map)
    rescue = (
        F.when(m.isNull() & raw_line.isNotNull(),
               F.to_json(F.create_map(F.lit(CORRUPT_KEY), raw_line)))
        .when(F.size(F.map_keys(rescued_map)) > 0, F.to_json(rescued_map))
        .otherwise(F.lit(None).cast("string"))
    )
    return (
        lines.withColumnRenamed(line_col, _RAW)
        .select(
            *[typed[n].alias(n) for n in pinned_names],
            rescue.alias(RESCUE_COLUMN),
        )
    )


def read_stream_json(
    spark: SparkSession,
    source_dir: str,
    schema_location: str,
    schema: T.StructType | None = None,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """S1 for NDJSON landing zones: incremental text-file discovery, pinned
    schema (captured on first contact unless declared), full rescue.

    Schema capture reuses :func:`..streaming.bronze.capture_schema` with the
    JSON reader, so re-starts never re-infer (and the pin never drifts —
    promote a rescued field by deleting the pin and re-capturing, same
    lifecycle as the parquet lane).
    """
    from .bronze import capture_schema

    if schema is None:
        pinned = capture_schema(spark, source_dir, schema_location, fmt="json")
    else:
        import json as _json
        import os

        # declared schema: still write the pin so later starts (and humans)
        # see the governing schema in one place
        os.makedirs(schema_location, exist_ok=True)
        pin = os.path.join(schema_location, "_captured_schema.json")
        if not os.path.exists(pin):
            with open(pin, "w") as fh:
                _json.dump(schema.jsonValue(), fh)
        pinned = schema
    reader = spark.readStream.format("text")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return parse_json_with_rescue(reader.load(source_dir), pinned)


def ingest_json(
    spark: SparkSession,
    source_dir: str,
    bronze_dir: str,
    checkpoint_dir: str,
    schema: T.StructType | None = None,
    max_files_per_trigger: int | None = None,
) -> None:
    """Run-once NDJSON→parquet bronze ingest (the JSON twin of
    ``bronze.ingest``): availableNow trigger, checkpointed exactly-once file
    log, rescue column materialized in bronze."""
    import os

    from .bronze import write_stream

    df = read_stream_json(
        spark, source_dir, os.path.join(checkpoint_dir, "_schema"),
        schema=schema, max_files_per_trigger=max_files_per_trigger,
    )
    write_stream(df, bronze_dir, checkpoint_dir).awaitTermination()
