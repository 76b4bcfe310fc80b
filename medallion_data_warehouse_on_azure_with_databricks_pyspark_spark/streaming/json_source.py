"""Text-encoded streaming sources (NDJSON + CSV) with full Auto Loader
rescue semantics (SURVEY.md §2.1 S1, §2.9 ST1; VERDICT r6 "What's missing"
#5).

The parquet bronze source (``streaming/bronze.py``) rescues *new* columns
but documents type *changes* of pinned columns as out of scope — parquet's
column reader enforces the pinned physical type, so an incompatible file
hard-fails the batch.  Text-encoded sources are different: the raw lexical
value is still present in the file, so Auto Loader's ``rescuedDataColumn``
captures **both** drift kinds per row:

* a pinned column whose value no longer parses as the pinned type
  (``{"value": "N/A"}`` under ``value DOUBLE``) → column is NULL, the raw
  lexeme lands in ``_rescued_data``;
* a field outside the pin → raw lexeme lands in ``_rescued_data``;
* (JSON) a line that is not a JSON object at all → the whole line lands
  under ``_corrupt_record`` inside ``_rescued_data``.

Design (all Catalyst expressions, zero UDFs, zero shuffles — a pure
projection over the text stream, so it scales exactly like the scan):

1. stream the files with the ``text`` source (same incremental-discovery +
   exactly-once file log as every other file stream);
2. lift each line into a name→lexeme map — ``from_json(line,
   map<string,string>)`` for NDJSON (Jackson preserves each scalar's
   lexical form: ``4.0`` stays ``"4.0"``, nested objects/arrays stringify
   to their JSON text), ``from_csv`` over an all-string header schema for
   CSV (quoting honored, short rows pad with NULL);
3. per pinned field, ``try_cast`` the lexeme to the pinned type; a
   non-NULL lexeme whose cast fails is a type-change → rescue;
4. fields outside the pin → rescue (JSON: ``map_filter`` on the parsed
   keys; CSV: header columns not in the pin);
5. ``to_json`` over the concatenated rescue map (NULL when empty), so the
   downstream contract is byte-identical to the parquet bronze lane's
   ``_rescued_data``.

Scope notes.  JSON: flat objects, one per line (the NDJSON landing-zone
shape); nested *values* are fine — an unexpected nested object is rescued
as its JSON text — but the pin itself must be scalar-typed.  CSV: the
header defines the file's column set (Auto Loader parity — a file growing
columns beyond the captured header is a schema-evolution event handled by
the re-capture lifecycle, not row-level rescue); there is no corrupt-line
concept because the permissive CSV reader always yields a row.

Oracle note: every step is deterministic string/cast arithmetic, so the
registered lane (``events_json_rescue_ingest``) is fully DuckDB-replayable
— the only cross-engine hazard is ``TRY_CAST`` disagreement on marginal
lexemes (DuckDB rounds ``'3.7'`` to INTEGER 4, Spark yields NULL), which
the lane avoids by corrupting with non-numeric lexemes.  The CSV twin
shares this module's rescue core, so the JSON lane's driver hash row
covers both projections.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.silver import RESCUE_COLUMN

#: Rescue-map key for lines that are not JSON objects at all (Auto Loader
#: uses the same reserved name for its corrupt-record capture).
CORRUPT_KEY = "_corrupt_record"

_RAW = "__text_raw_line"


def _validate_pin(pinned: T.StructType) -> None:
    for f in pinned.fields:
        if isinstance(f.dataType, (T.StructType, T.ArrayType, T.MapType)):
            raise ValueError(
                f"pinned field {f.name!r} is nested ({f.dataType.simpleString()}); "
                "the text rescue sources pin scalar fields only — nested "
                "payloads belong in a string column (rescued or declared)"
            )


def _project_with_rescue(
    lines: DataFrame,
    pinned: T.StructType,
    lexemes: dict[str, Column],
    extra_map: Column,
    corrupt: Column,
    line_col: str,
) -> DataFrame:
    """The shared rescue core: type the pinned lexemes, fold failed casts +
    out-of-pin fields into one ``_rescued_data`` JSON column.

    ``lexemes``: pinned-field name → raw lexeme column; ``extra_map``: a
    ``map<string,string>`` of out-of-pin fields; ``corrupt``: predicate
    marking lines that produced no record at all (whole line rescued).
    """
    raw_line = F.col(_RAW)
    typed: dict[str, Column] = {}
    bad_entries = []
    for f in pinned.fields:
        lexeme = lexemes[f.name]
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
    rescued_map = F.map_concat(bad_map, extra_map)
    rescue = (
        F.when(corrupt & raw_line.isNotNull(),
               F.to_json(F.create_map(F.lit(CORRUPT_KEY), raw_line)))
        .when(F.size(F.map_keys(rescued_map)) > 0, F.to_json(rescued_map))
        .otherwise(F.lit(None).cast("string"))
    )
    return (
        lines.withColumnRenamed(line_col, _RAW)
        .select(
            *[typed[f.name].alias(f.name) for f in pinned.fields],
            rescue.alias(RESCUE_COLUMN),
        )
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
    m = F.from_json(F.col(_RAW), "map<string,string>")
    lexemes = {n: m[n] for n in pinned_names}
    extra_map = F.map_filter(
        m,
        lambda k, _v: reduce(
            lambda acc, n: acc & (k != F.lit(n)), pinned_names, F.lit(True)
        ),
    )
    return _project_with_rescue(
        lines, pinned, lexemes, extra_map, m.isNull(), line_col
    )


def parse_csv_with_rescue(
    lines: DataFrame,
    pinned: T.StructType,
    header: list[str],
    sep: str = ",",
    line_col: str = "value",
) -> DataFrame:
    """CSV twin of :func:`parse_json_with_rescue`: positional parse against
    the captured ``header`` (quoting honored by ``from_csv``; short rows
    pad with NULL), then the shared rescue core — pinned-column type
    changes rescued per row, header columns outside the pin rescued when
    present.  Header lines themselves are dropped (every landing file
    repeats the header)."""
    _validate_pin(pinned)
    if not header:
        raise ValueError("CSV rescue needs the captured header column list")
    missing = [f.name for f in pinned.fields if f.name not in header]
    if missing:
        raise ValueError(
            f"pinned fields {missing} absent from the CSV header {header}"
        )
    all_string = ", ".join(f"`{h}` string" for h in header)
    parsed = F.from_csv(F.col(_RAW), F.lit(all_string), {"sep": sep})
    lexemes = {f.name: parsed[f.name] for f in pinned.fields}
    pinned_names = {f.name for f in pinned.fields}
    extra_entries = [
        F.when(
            parsed[h].isNotNull(),
            F.struct(F.lit(h).alias("key"), parsed[h].alias("value")),
        )
        for h in header
        if h not in pinned_names
    ]
    if extra_entries:
        extra_map = F.map_from_entries(
            F.filter(F.array(*extra_entries), lambda e: e.isNotNull())
        )
    else:
        extra_map = F.create_map().cast("map<string,string>")
    header_line = sep.join(header)
    return _project_with_rescue(
        lines.where(F.col(line_col) != F.lit(header_line)),
        pinned, lexemes, extra_map, F.lit(False), line_col,
    )


def _pin_or_capture(
    spark: SparkSession,
    source_dir: str,
    schema_location: str,
    fmt: str,
    schema: T.StructType | None,
) -> T.StructType:
    """Resolve the governing schema: the declared one (pin written on first
    use so later starts and humans see it in one place), else captured via
    the format's batch reader (:func:`..streaming.bronze.capture_schema`
    lifecycle — the pin never drifts; promote a rescued field by deleting
    the pin and re-capturing)."""
    from .bronze import capture_schema

    if schema is None:
        return capture_schema(spark, source_dir, schema_location, fmt=fmt)
    import json as _json
    import os

    os.makedirs(schema_location, exist_ok=True)
    pin = os.path.join(schema_location, "_captured_schema.json")
    if not os.path.exists(pin):
        with open(pin, "w") as fh:
            _json.dump(schema.jsonValue(), fh)
    return schema


def read_stream_json(
    spark: SparkSession,
    source_dir: str,
    schema_location: str,
    schema: T.StructType | None = None,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """S1 for NDJSON landing zones: incremental text-file discovery, pinned
    schema (captured on first contact unless declared), full rescue."""
    pinned = _pin_or_capture(spark, source_dir, schema_location, "json", schema)
    reader = spark.readStream.format("text")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return parse_json_with_rescue(reader.load(source_dir), pinned)


def read_stream_csv(
    spark: SparkSession,
    source_dir: str,
    schema_location: str,
    header: list[str],
    schema: T.StructType | None = None,
    sep: str = ",",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """S1 for CSV landing zones — same incremental text stream, positional
    parse against ``header``, shared rescue core."""
    pinned = _pin_or_capture(spark, source_dir, schema_location, "csv", schema)
    reader = spark.readStream.format("text")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return parse_csv_with_rescue(reader.load(source_dir), pinned, header, sep=sep)


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


def ingest_csv(
    spark: SparkSession,
    source_dir: str,
    bronze_dir: str,
    checkpoint_dir: str,
    header: list[str],
    schema: T.StructType | None = None,
    sep: str = ",",
    max_files_per_trigger: int | None = None,
) -> None:
    """Run-once CSV→parquet bronze ingest (availableNow, checkpointed,
    rescue materialized)."""
    import os

    from .bronze import write_stream

    df = read_stream_csv(
        spark, source_dir, os.path.join(checkpoint_dir, "_schema"),
        header, schema=schema, sep=sep,
        max_files_per_trigger=max_files_per_trigger,
    )
    write_stream(df, bronze_dir, checkpoint_dir).awaitTermination()
