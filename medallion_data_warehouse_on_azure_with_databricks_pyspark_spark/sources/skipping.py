"""File-level data skipping: per-file min/max stats + manifest-pruned scans.

Delta data skipping (which the reference's gold tables get for free from
the Delta log it writes at ``/root/reference/Gold_Customers.py:65-68``)
records per-file column min/max at write time and prunes files whose
range cannot satisfy a query predicate — the difference between scanning
100 TB and scanning the 2 GB that can match.  delta-spark is env-blocked
here (COVERAGE.md r3), so this module supplies the same mechanism on the
plain-parquet lane:

* ``write_stats_manifest`` records one stats row per data file — min,
  max, null count for the requested columns plus a row count — and
  stores it as parquet under ``<table>/_file_stats/``.  The ``_``
  prefix makes the manifest invisible to every normal reader
  (Spark/Hadoop hide ``_``/``.`` paths), exactly like ``_delta_log``.
  Since r15 the stats are HARVESTED FROM THE PARQUET FOOTERS
  driver-side whenever they are exact there (numeric columns — the
  Iceberg manifest pattern: the writer already recorded them, so the
  rebuild is a metadata read, zero Spark jobs); strings (truncatable
  bounds), NaN chunks, and hive-partition columns fall back to the
  original single distributed pass (group by ``_metadata.file_path``).
* ``pruned_files`` evaluates a ``col BETWEEN lo AND hi`` (or one-sided)
  predicate against the manifest and returns only the files whose
  [min, max] interval intersects it — a file with no stats row is kept
  (never wrong, merely unpruned), mirroring Delta's missing-stats rule.
* ``read_skipping`` reads just those files and re-applies the predicate
  as a residual filter, so the result is bit-identical to the full scan
  (skipping is an I/O optimization, never a semantics change).

Scale notes:
- The stats pass costs one scan at write time and is map-side combinable
  (min/max/count partials), the same cost profile as Delta's stats
  collection.
- The manifest is one row per file: at 100 TB / 128 MB files that is
  ~800k rows — the pruning evaluation stays a DataFrame job and only the
  *matching file list* is collected to the driver (bounded by the
  selectivity of the predicate, same contract as Delta's log replay).
  For point/range lookups on a sorted/clustered layout that list is tiny.
- Skipping only bites when the writer clusters the column (sorted,
  range-partitioned, or Z-ordered — ``operators/layout.py``); on a
  random layout every file intersects every range.  That is inherent to
  min/max pruning, not a flaw.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

STATS_DIR = "_file_stats"


def _refuse_column_mapped(path: str, op: str) -> None:
    """File-level skipping reads parquet footers and file columns
    DIRECTLY — physical names — so on a column-mapped table (logical
    names diverged via RENAME/DROP COLUMN) a manifest would silently
    disagree with the logical schema.  v1 refuses loudly; a full
    overwrite resets the mapping and re-enables pruning."""
    from . import versioned

    versioned._refuse_mapped(path, op)



#: Parquet physical types whose footer min/max are EXACT (never
#: truncated).  BYTE_ARRAY (strings) can carry truncated bounds,
#: INT96 is the deprecated timestamp encoding — both fall back to the
#: scan path; NaN-bearing float chunks simply omit min/max and fall
#: back the same way.
_FOOTER_EXACT_PHYSICAL = {"INT32", "INT64", "FLOAT", "DOUBLE"}


def _local_path(p: str) -> str:
    """file:-URI or plain path -> local filesystem path."""
    if p.startswith("file:"):
        p = p[len("file:"):]
        while p.startswith("//"):
            p = p[1:]
    return p


def _list_parquet_files(path: str) -> list[str]:
    """Every visible .parquet under ``path`` — the same set
    ``spark.read.parquet(path)`` scans (``_``/``.`` entries hidden)."""
    found = []
    for root, dirs, names in os.walk(path):
        dirs[:] = [d for d in dirs if not d.startswith(("_", "."))]
        found += [
            os.path.join(root, n) for n in names
            if n.endswith(".parquet") and not n.startswith(("_", "."))
        ]
    return sorted(found)


def _footer_manifest_rows(columns: list[str], files: list[str]):
    """Per-file stats harvested from parquet FOOTERS — the
    Iceberg/Delta-at-write pattern: the writer already recorded exact
    min/max/null-count per column chunk, so rebuilding the manifest is a
    driver-side metadata read, not a second pass over the data.  Returns
    None unless EVERY (file, column) chunk carries exact numeric stats
    (string bounds can be truncated, NaN suppresses min/max,
    hive-partition columns are absent from the files) — the caller
    falls back to the distributed scan, which handles all of those."""
    import pyarrow.parquet as pq

    rows = []
    for f in files:
        local = _local_path(f)
        md = pq.ParquetFile(local).metadata
        if md.num_rows == 0:
            continue  # scan-path parity: a 0-row file gets no stats row
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        # Spark's _metadata.file_path URI form, so liveness/coverage
        # comparisons are bit-equal across both build paths
        row = {"file_path": "file:" + os.path.abspath(local),
               "row_count": md.num_rows}
        for c in columns:
            i = idx.get(c)
            if i is None:
                return None  # partition column / schema drift
            mn = mx = None
            nulls = 0
            for g in range(md.num_row_groups):
                st = md.row_group(g).column(i).statistics
                if (
                    st is None
                    or not st.has_min_max
                    or st.physical_type not in _FOOTER_EXACT_PHYSICAL
                    or st.null_count is None
                ):
                    return None
                nulls += st.null_count
                mn = st.min if mn is None or st.min < mn else mn
                mx = st.max if mx is None or st.max > mx else mx
            if mn is None:
                return None
            row[f"min__{c}"] = mn
            row[f"max__{c}"] = mx
            row[f"nulls__{c}"] = nulls
        rows.append(row)
    return rows or None


def write_stats_manifest(
    spark: SparkSession, path: str, columns: list[str],
    files: list[str] | None = None,
    source: str = "auto",
) -> DataFrame:
    """Per-file stats for ``columns`` written to ``<path>/_file_stats``;
    returns the manifest.  ``files`` pins an explicit file list —
    manifest-mode versioned tables pass their LIVE set, because their
    root also holds superseded files that must not re-enter the manifest.

    ``source="auto"`` (default) harvests the stats from the parquet
    FOOTERS driver-side when every chunk carries exact numeric min/max —
    zero Spark jobs, the Iceberg manifest pattern; anything the footers
    can't answer exactly (strings, NaN chunks, partition columns, empty
    stats) falls back to the original one-pass distributed scan.
    ``source="scan"`` forces the scan."""
    _refuse_column_mapped(path, "write_stats_manifest")
    out = os.path.join(path.rstrip("/"), STATS_DIR)
    if source == "auto":
        try:
            flist = files if files is not None else _list_parquet_files(path)
            rows = _footer_manifest_rows(columns, flist)
        except Exception:
            rows = None
        if rows is not None:
            import pyarrow as pa
            import pyarrow.parquet as pq

            tbl = pa.Table.from_pylist(rows)
            if os.path.isdir(out):
                shutil.rmtree(out)
            os.makedirs(out, exist_ok=True)
            pq.write_table(tbl, os.path.join(out, "part-00000.parquet"))
            return spark.read.parquet(out)
    elif source != "scan":
        raise ValueError(f"unknown stats source {source!r}")
    if files is not None:
        df = spark.read.option("basePath", path).parquet(*files)
    else:
        df = spark.read.parquet(path)
    rows = df.select(F.col("_metadata.file_path").alias("file_path"), *columns)
    aggs = [F.count(F.lit(1)).alias("row_count")]
    for c in columns:
        aggs += [
            F.min(c).alias(f"min__{c}"),
            F.max(c).alias(f"max__{c}"),
            F.count(F.when(F.col(c).isNull(), 1)).alias(f"nulls__{c}"),
        ]
    manifest = rows.groupBy("file_path").agg(*aggs)
    manifest.coalesce(1).write.mode("overwrite").parquet(out)
    return spark.read.parquet(out)


def read_stats_manifest(spark: SparkSession, path: str) -> DataFrame | None:
    out = os.path.join(path.rstrip("/"), STATS_DIR)
    if not os.path.isdir(out):
        return None
    return spark.read.parquet(out)


def read_stats_manifest_driver_side(path: str):
    """The stats manifest as ``(rows, column_name_set)`` read with
    pyarrow on the DRIVER — no Spark job.  The manifest is bounded
    metadata by contract (one row per live file), so metadata consumers
    (health polls, file pruning, envelope bounds) should cost a local
    parquet read, not a JVM scan round-trip; on a real cluster this lets
    a scheduler poll hundreds of tables without queueing Spark jobs.
    Returns ``(None, None)`` when absent or unreadable — callers fall
    back to the distributed path."""
    out = os.path.join(path.rstrip("/"), STATS_DIR)
    if not os.path.isdir(out):
        return None, None
    try:
        import pyarrow.parquet as pq

        tbl = pq.read_table(out)  # ignores _/.-prefixed sidecars
        return tbl.to_pylist(), set(tbl.schema.names)
    except Exception:  # unreadable/corrupt manifest: distrust
        return None, None


def _keep_condition(manifest_cols: list[str], predicates: dict):
    """Conjunctive intersection test over [min,max] intervals; a column
    the manifest never collected keeps the file (unknown ⇒ unprunable)."""
    keep = F.lit(True)
    for column, (lower, upper) in predicates.items():
        if f"min__{column}" not in manifest_cols:
            continue
        if lower is not None:
            # file can match unless its max is known and below the bound
            keep = keep & (F.col(f"max__{column}").isNull()
                           | (F.col(f"max__{column}") >= F.lit(lower)))
        if upper is not None:
            keep = keep & (F.col(f"min__{column}").isNull()
                           | (F.col(f"min__{column}") <= F.lit(upper)))
    return keep


def pruned_files_multi(
    spark: SparkSession,
    path: str,
    predicates: dict,
) -> tuple[list[str], int]:
    """Files whose stats intersect EVERY ``column -> (lower, upper)``
    range (either bound may be None) — conjunctive box pruning, the shape
    Z-ordered layouts exist to serve: each file covers a compact region
    of the clustered plane, so a box predicate discards files on every
    dimension at once.  Returns ``(kept_files, total_live_files)``;
    files without a stats row, or predicates on uncollected columns,
    keep files.  The decision is LIVENESS-VERIFIED against the current
    live set (r16): a manifest row for a retired file never serves, and
    a live file the manifest misses is always kept — see
    :func:`_liveness_verified`.

    The collect here is the bounded driver-side step every log-based
    format has (Delta/Iceberg replay their manifests on the driver); the
    collected payload is file PATHS only, never data.  The interval test
    itself runs DRIVER-SIDE over the pyarrow-read manifest (exactly how
    Delta/Iceberg evaluate data skipping — no Spark job for a metadata
    decision); mixed-type bounds the Python comparison can't order fall
    back to the Spark path so SQL coercion decides.
    """
    _refuse_column_mapped(path, "pruned (stats) reads")
    live = _live_file_uris(path)
    rows, cols = read_stats_manifest_driver_side(path)
    if rows is not None:
        try:
            kept = [
                r["file_path"] for r in rows
                if _keep_py(r, cols, predicates)
            ]
            return _liveness_verified(
                kept, {r["file_path"] for r in rows}, live
            )
        except TypeError:
            pass  # e.g. str bound vs timestamp stats: let Spark coerce
    manifest = read_stats_manifest(spark, path)
    if manifest is None:
        raise FileNotFoundError(f"no stats manifest under {path}")
    described = {r.file_path for r in manifest.select("file_path").collect()}
    keep = _keep_condition(manifest.columns, predicates)
    kept = [r.file_path for r in manifest.where(keep).select("file_path").collect()]
    return _liveness_verified(kept, described, live)


def _keep_py(row: dict, manifest_cols: set, predicates: dict) -> bool:
    """Python twin of :func:`_keep_condition` for the driver-side path —
    same semantics: unknown column or NULL bound keeps the file.  NaN
    stats keep the file too: Spark's ordering puts NaN above every value
    (so a NaN max passes ``>= lower``), while a Python NaN comparison is
    always False — treating NaN as unknown preserves the never-wrongly-
    prune contract on both sides."""
    import math

    def _nan(v):
        return isinstance(v, float) and math.isnan(v)

    for column, (lower, upper) in predicates.items():
        if f"min__{column}" not in manifest_cols:
            continue
        mx, mn = row.get(f"max__{column}"), row.get(f"min__{column}")
        if _nan(mx):
            mx = None
        if _nan(mn):
            mn = None
        if lower is not None and mx is not None and not mx >= lower:
            return False
        if upper is not None and mn is not None and not mn <= upper:
            return False
    return True


def _live_file_uris(path: str) -> set[str]:
    """The CURRENT live data files as ``_metadata.file_path``-form URIs
    — versioned manifest-mode tables resolve through their snapshot
    (their roots also hold RETIRED files); everything else lists the
    directory.  Driver-side metadata, the ``table_detail`` cost class."""
    from . import versioned  # lazy — versioned imports this module lazily

    v = versioned.current_version(path)
    if v is not None and versioned.snapshot_mode(path) == "manifest":
        return {
            "file:" + os.path.abspath(os.path.join(path, r))
            for r in versioned._snapshot_files(path, v)
        }
    out: set[str] = set()
    for root, dirs, files in os.walk(path):
        dirs[:] = [d for d in dirs if not d.startswith(("_", "."))]
        for f in files:
            if f.endswith(".parquet") and not f.startswith(("_", ".")):
                out.add("file:" + os.path.abspath(os.path.join(root, f)))
    return out


def _liveness_verified(
    kept: list[str], described: set[str], live: set[str]
) -> tuple[list[str], int]:
    """Apply the liveness rule to a pruning decision (r16 — VERDICT r15
    noted the prune paths trusted the manifest blindly, unlike
    cluster_health): a manifest row for a RETIRED file is dropped (in
    manifest mode that file still exists on disk — serving it would
    answer from an old snapshot), and a LIVE file the manifest does not
    describe is KEPT (pruning it would MISS rows — unknown is always
    unprunable).  Turns any missed sidecar maintenance anywhere into a
    perf non-event instead of a wrong answer; in the steady state
    (manifest == live) it is a set intersection no-op."""
    verified = [f for f in kept if f in live]
    verified += sorted(live - described)
    return verified, len(live)


def pruned_files(
    spark: SparkSession,
    path: str,
    column: str,
    lower=None,
    upper=None,
) -> tuple[list[str], int]:
    """Single-column :func:`pruned_files_multi`."""
    return pruned_files_multi(spark, path, {column: (lower, upper)})


def read_skipping_multi(
    spark: SparkSession,
    path: str,
    predicates: dict,
) -> DataFrame:
    """Manifest-pruned conjunctive box scan: open only files whose stats
    intersect every range, then re-apply ALL predicates as residual
    filters — bit-identical to the full scan."""
    files, _total = pruned_files_multi(spark, path, predicates)
    if not files:
        return spark.read.parquet(path).where(F.lit(False))
    df = spark.read.option("basePath", path).parquet(*files)
    for column, (lower, upper) in predicates.items():
        if lower is not None:
            df = df.where(F.col(column) >= F.lit(lower))
        if upper is not None:
            df = df.where(F.col(column) <= F.lit(upper))
    return df


BLOOM_DIR = "_file_bloom"


def _bloom_positions(col, num_bits: int, num_hashes: int):
    """The k seeded-xxhash64 bit positions of a value (array<int>).

    ``xxhash64(value, seed)`` with k distinct literal seeds gives k
    independent 64-bit hashes; ``pmod(..., num_bits)`` maps each into the
    fixed bit domain.  Everything stays a Catalyst projection — no UDF.
    """
    return F.array(
        *[
            F.pmod(F.xxhash64(col, F.lit(seed)), F.lit(num_bits)).cast("int")
            for seed in range(1, num_hashes + 1)
        ]
    )


def write_bloom_manifest(
    spark: SparkSession,
    path: str,
    column: str,
    num_bits: int = 8192,
    num_hashes: int = 4,
    files: list[str] | None = None,
) -> DataFrame:
    """Per-file Bloom filter over ``column`` for EQUALITY skipping —
    the complement of min/max: a high-cardinality column with no
    clustering never prunes by range, but its per-file membership still
    prunes point lookups (Delta bloom filter indexes / Parquet bloom
    pages are this mechanism).

    Each file's filter is the distinct set of set-bit positions
    (``array<int>``, ≤ ``num_bits`` entries — the manifest is bounded by
    bits-per-file regardless of row count, the Bloom property that makes
    this scale).  One distributed pass; overwrites
    ``<table>/_file_bloom``.  ``files`` pins the scan to an explicit
    live-file list (manifest-mode versioned tables).
    """
    _refuse_column_mapped(path, "write_bloom_manifest")
    if files is not None:
        df = spark.read.option("basePath", path).parquet(*files)
    else:
        df = spark.read.parquet(path)
    pos = (
        df.select(
            F.col("_metadata.file_path").alias("file_path"), F.col(column).alias("v")
        )
        .where(F.col("v").isNotNull())
        .select(
            "file_path",
            F.explode(_bloom_positions(F.col("v"), num_bits, num_hashes)).alias("bit"),
        )
        .groupBy("file_path")
        .agg(F.sort_array(F.collect_set("bit")).alias("bits"))
    )
    # Right-join the full file list so all-NULL files get an EMPTY filter
    # (they can never satisfy an equality predicate) rather than a missing
    # row (which the keep-if-unknown rule would never prune).
    all_files = (
        df.select(F.col("_metadata.file_path").alias("file_path")).distinct()
    )
    manifest = (
        all_files.join(pos, "file_path", "left")
        .select(
            "file_path",
            F.coalesce("bits", F.array().cast("array<int>")).alias("bits"),
            F.lit(column).alias("column"),
            F.lit(num_bits).alias("num_bits"),
            F.lit(num_hashes).alias("num_hashes"),
        )
    )
    out = os.path.join(path.rstrip("/"), BLOOM_DIR)
    manifest.coalesce(1).write.mode("overwrite").parquet(out)
    return spark.read.parquet(out)


def bloom_pruned_files(
    spark: SparkSession, path: str, column: str, value
) -> tuple[list[str], int]:
    """Files that MIGHT contain ``column == value`` per the Bloom
    manifest (no false negatives; false-positive rate set by
    bits/hashes).  Files whose manifest targets a different column are
    kept (unknown ⇒ unprunable)."""
    _refuse_column_mapped(path, "pruned (bloom) reads")
    out = os.path.join(path.rstrip("/"), BLOOM_DIR)
    if not os.path.isdir(out):
        raise FileNotFoundError(f"no bloom manifest under {path}")
    live = _live_file_uris(path)
    manifest = spark.read.parquet(out)
    head = manifest.select("column", "num_bits", "num_hashes").first()
    described = {r.file_path for r in manifest.select("file_path").collect()}
    if head is None or head.column != column:
        return _liveness_verified(sorted(described), described, live)
    probe = _bloom_positions(F.lit(value), head.num_bits, head.num_hashes)
    kept_df = manifest.where(
        F.size(F.array_except(probe, F.col("bits"))) == 0
    )
    kept = [r.file_path for r in kept_df.select("file_path").collect()]
    return _liveness_verified(kept, described, live)


def read_bloom_skipping(
    spark: SparkSession, path: str, column: str, value
) -> DataFrame:
    """Bloom-pruned equality scan: open only files that might contain the
    value, re-apply the predicate as the residual filter (false positives
    are filtered, never surfaced) — bit-identical to the full scan."""
    files, _total = bloom_pruned_files(spark, path, column, value)
    if not files:
        return spark.read.parquet(path).where(F.lit(False))
    return (spark.read.option("basePath", path).parquet(*files)
            .where(F.col(column) == F.lit(value)))


def read_skipping(
    spark: SparkSession,
    path: str,
    column: str,
    lower=None,
    upper=None,
) -> DataFrame:
    """Manifest-pruned range scan: read only the files that can contain
    ``column`` in [lower, upper], then re-apply the predicate as the
    residual filter.  Bit-identical to the full scan with the same
    filter; reads a subset of the files when the layout clusters the
    column.
    """
    files, _total = pruned_files(spark, path, column, lower, upper)
    if not files:
        # No file can match: an empty frame with the table's schema.
        return (
            spark.read.parquet(path)
            .where(F.lit(False))
        )
    df = spark.read.option("basePath", path).parquet(*files)
    if lower is not None:
        df = df.where(F.col(column) >= F.lit(lower))
    if upper is not None:
        df = df.where(F.col(column) <= F.lit(upper))
    return df


def _stats_aggs(columns: list[str]) -> list:
    """The per-file stats aggregate set shared by full and incremental
    manifest builds."""
    aggs = [F.count(F.lit(1)).alias("row_count")]
    for c in columns:
        aggs += [
            F.min(c).alias(f"min__{c}"),
            F.max(c).alias(f"max__{c}"),
            F.count(F.when(F.col(c).isNull(), 1)).alias(f"nulls__{c}"),
        ]
    return aggs


def _swap_manifest_dir(merged: DataFrame, out: str) -> None:
    """Atomically replace a manifest dir with ``merged`` (stage + rename,
    so a concurrent reader never sees a half-written manifest)."""
    tmp = out + ".__tmp"
    merged.write.mode("overwrite").parquet(tmp)
    if os.path.isdir(out):
        shutil.rmtree(out)
    os.rename(tmp, out)


def update_bloom_manifest_partitions(
    spark: SparkSession,
    path: str,
    touched_partitions: list[str],
    old_manifest: DataFrame,
    files: list[str] | None = None,
) -> DataFrame | None:
    """Incremental BLOOM manifest maintenance for a partition-scoped
    commit — the equality-skipping counterpart of
    :func:`update_stats_manifest_partitions` (VERDICT r11 ask #3: after
    a ``replace_partitions`` the stats manifest was maintained but
    ``_file_bloom`` still described the replaced files, so equality
    probes silently stopped pruning exactly the partitions that churn
    most).  Rows for untouched partitions survive verbatim (their files
    kept their paths through the commit); the touched partitions'
    filters are recomputed in ONE scan bounded by the commit, with the
    same column / num_bits / num_hashes the standing manifest was built
    with — mixing parameters would break the probe's bit arithmetic.
    A zero-row sidecar carries no config to rebuild with: delete it
    (no bloom = no pruning = safe) instead of dereferencing None, and
    return ``None`` — NOT the old frame, whose backing parquet files
    the rmtree just deleted; any action on it would raise a
    missing-file error (ADVICE r16 #3; current callers ignore the
    return, so this pins the contract before it bites).
    """
    head = old_manifest.select("column", "num_bits", "num_hashes").first()
    if head is None:
        shutil.rmtree(os.path.join(path.rstrip("/"), BLOOM_DIR),
                      ignore_errors=True)
        return None
    cond = F.lit(False)
    for t in touched_partitions:
        cond = cond | F.col("file_path").contains(f"/{t}/")
    keep_old = old_manifest.filter(~cond)
    new_scan = spark.read.option("basePath", path).parquet(
        *(files if files is not None
          else [os.path.join(path, t) for t in touched_partitions])
    )
    pos = (
        new_scan.select(
            F.col("_metadata.file_path").alias("file_path"),
            F.col(head.column).alias("v"),
        )
        .where(F.col("v").isNotNull())
        .select(
            "file_path",
            F.explode(
                _bloom_positions(F.col("v"), head.num_bits, head.num_hashes)
            ).alias("bit"),
        )
        .groupBy("file_path")
        .agg(F.sort_array(F.collect_set("bit")).alias("bits"))
    )
    all_new = (
        new_scan.select(F.col("_metadata.file_path").alias("file_path"))
        .distinct()
    )
    new_rows = all_new.join(pos, "file_path", "left").select(
        "file_path",
        F.coalesce("bits", F.array().cast("array<int>")).alias("bits"),
        F.lit(head.column).alias("column"),
        F.lit(head.num_bits).alias("num_bits"),
        F.lit(head.num_hashes).alias("num_hashes"),
    )
    merged = keep_old.unionByName(new_rows).coalesce(1)
    out = os.path.join(path.rstrip("/"), BLOOM_DIR)
    _swap_manifest_dir(merged, out)
    return spark.read.parquet(out)


def update_bloom_manifest_files(
    spark: SparkSession,
    path: str,
    removed: list[str],
    added: list[str],
    old_manifest: DataFrame,
) -> DataFrame | None:
    """File-subset twin of :func:`update_bloom_manifest_partitions` for
    ``replace_files``/append commits (r15): rows for the retired files
    drop from the manifest, filters for the added files compute in ONE
    scan bounded by the commit (same column/bits/hashes the standing
    manifest was built with), untouched files' rows survive verbatim.
    ``removed``/``added`` are table-relative paths as the commit log
    lists them.  A stale bloom manifest after a file-subset commit
    would serve RETIRED files to equality probes — in manifest mode
    those files still exist on disk, so this is a correctness hole, not
    a staleness one.

    A ZERO-ROW sidecar carries no column/bits/hashes config to rebuild
    with, so it is deleted instead of dereferenced (ADVICE r15 #3: the
    old ``head.column`` raised AttributeError AFTER the commit had
    landed, failing the caller for a transaction that actually
    committed) — no bloom manifest means no pruning, which is always
    safe.  That branch returns ``None``, not the old frame: its backing
    files are gone, so any caller action on it would raise a
    missing-file error (ADVICE r16 #3)."""
    head = old_manifest.select("column", "num_bits", "num_hashes").first()
    if head is None:
        shutil.rmtree(os.path.join(path.rstrip("/"), BLOOM_DIR),
                      ignore_errors=True)
        return None
    removed_uris = [
        "file:" + os.path.abspath(os.path.join(path, r)) for r in removed
    ]
    keep_old = (
        old_manifest.filter(~F.col("file_path").isin(removed_uris))
        if removed_uris else old_manifest
    )
    if added:
        new_scan = spark.read.option("basePath", path).parquet(
            *[os.path.join(path, a) for a in added]
        )
        pos = (
            new_scan.select(
                F.col("_metadata.file_path").alias("file_path"),
                F.col(head.column).alias("v"),
            )
            .where(F.col("v").isNotNull())
            .select(
                "file_path",
                F.explode(
                    _bloom_positions(F.col("v"), head.num_bits, head.num_hashes)
                ).alias("bit"),
            )
            .groupBy("file_path")
            .agg(F.sort_array(F.collect_set("bit")).alias("bits"))
        )
        all_new = (
            new_scan.select(F.col("_metadata.file_path").alias("file_path"))
            .distinct()
        )
        new_rows = all_new.join(pos, "file_path", "left").select(
            "file_path",
            F.coalesce("bits", F.array().cast("array<int>")).alias("bits"),
            F.lit(head.column).alias("column"),
            F.lit(head.num_bits).alias("num_bits"),
            F.lit(head.num_hashes).alias("num_hashes"),
        )
        merged = keep_old.unionByName(new_rows).coalesce(1)
    else:
        merged = keep_old.coalesce(1)
    out = os.path.join(path.rstrip("/"), BLOOM_DIR)
    _swap_manifest_dir(merged, out)
    return spark.read.parquet(out)


def update_stats_manifest_partitions(
    spark: SparkSession,
    path: str,
    touched_partitions: list[str],
    old_manifest: DataFrame,
    files: list[str] | None = None,
) -> DataFrame:
    """Incremental manifest maintenance for a partition-scoped commit
    (``sources/versioned.py::replace_partitions``): keep the old
    manifest's rows for untouched partitions (their files kept the SAME
    paths through the hardlink assembly, so the rows stay valid), and
    recompute stats ONLY for files under the touched partition dirs —
    one scan proportional to the commit, never the table.  Without this
    a partition replace would leave new files absent from the manifest,
    and a manifest-pruned scan would silently drop them — the one
    failure mode skipping must never have."""
    stats_cols = [
        c[len("min__"):] for c in old_manifest.columns if c.startswith("min__")
    ]
    cond = F.lit(False)
    for t in touched_partitions:
        cond = cond | F.col("file_path").contains(f"/{t}/")
    keep_old = old_manifest.filter(~cond)
    new_scan = spark.read.option("basePath", path).parquet(
        *(files if files is not None
          else [os.path.join(path, t) for t in touched_partitions])
    )
    new_stats = (
        new_scan.select(
            F.col("_metadata.file_path").alias("file_path"), *stats_cols
        )
        .groupBy("file_path")
        .agg(*_stats_aggs(stats_cols))
    )
    merged = keep_old.unionByName(new_stats).coalesce(1)
    out = os.path.join(path.rstrip("/"), STATS_DIR)
    _swap_manifest_dir(merged, out)
    return spark.read.parquet(out)
