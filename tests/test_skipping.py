"""File-level data skipping: pruning actually skips files, results exact."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from medallion_data_warehouse_on_azure_with_databricks_pyspark_spark.sources import skipping

from .conftest import SF_DIR


@pytest.fixture(scope="module")
def clustered_part(spark):
    work = tempfile.mkdtemp(prefix="skiptest_")
    table = f"{work}/part"
    part = spark.read.parquet(f"{SF_DIR}/part.parquet")
    part.repartitionByRange(8, "p_retailprice").write.mode("overwrite").parquet(table)
    skipping.write_stats_manifest(spark, table, ["p_retailprice", "p_size"])
    return table


def test_manifest_covers_every_file(spark, clustered_part):
    manifest = skipping.read_stats_manifest(spark, clustered_part)
    data_files = {
        r.file_path
        for r in spark.read.parquet(clustered_part)
        .select(F.col("_metadata.file_path").alias("file_path"))
        .distinct()
        .collect()
    }
    assert {r.file_path for r in manifest.collect()} == data_files
    total_rows = sum(r.row_count for r in manifest.collect())
    assert total_rows == spark.read.parquet(clustered_part).count()


def test_range_scan_prunes_files(spark, clustered_part):
    kept, total = skipping.pruned_files(
        spark, clustered_part, "p_retailprice", lower=905.0, upper=912.0
    )
    assert total == 8
    # Range-clustered layout: a ~7-wide slice of the >=20-wide domain
    # must not touch every file.
    assert 0 < len(kept) < total


def test_pruned_scan_is_bit_identical_to_full_scan(spark, clustered_part):
    pruned = skipping.read_skipping(
        spark, clustered_part, "p_retailprice", lower=905.0, upper=912.0
    )
    full = spark.read.parquet(clustered_part).where(
        (F.col("p_retailprice") >= 905.0) & (F.col("p_retailprice") <= 912.0)
    )
    assert sorted(map(tuple, pruned.collect())) == sorted(map(tuple, full.collect()))


def test_one_sided_bounds(spark, clustered_part):
    lo_only = skipping.read_skipping(spark, clustered_part, "p_retailprice", lower=918.0)
    assert lo_only.count() == (
        spark.read.parquet(clustered_part).where(F.col("p_retailprice") >= 918.0).count()
    )
    hi_only = skipping.read_skipping(spark, clustered_part, "p_retailprice", upper=902.0)
    assert hi_only.count() == (
        spark.read.parquet(clustered_part).where(F.col("p_retailprice") <= 902.0).count()
    )


def test_empty_intersection_returns_empty_with_schema(spark, clustered_part):
    out = skipping.read_skipping(
        spark, clustered_part, "p_retailprice", lower=1e9, upper=2e9
    )
    assert out.count() == 0
    assert out.columns == spark.read.parquet(clustered_part).columns


def test_unclustered_column_keeps_all_files(spark, clustered_part):
    # p_size is uncorrelated with the p_retailprice clustering: every file
    # spans (nearly) the whole p_size domain, so a mid-range slice prunes
    # nothing — and read_skipping must still be exact.
    kept, total = skipping.pruned_files(spark, clustered_part, "p_size", lower=20, upper=30)
    assert len(kept) == total
    pruned = skipping.read_skipping(spark, clustered_part, "p_size", lower=20, upper=30)
    full = spark.read.parquet(clustered_part).where(
        (F.col("p_size") >= 20) & (F.col("p_size") <= 30)
    )
    assert pruned.count() == full.count()


def test_manifest_hidden_from_normal_readers(spark, clustered_part):
    # _file_stats must not pollute table reads (the _delta_log contract).
    assert os.path.isdir(os.path.join(clustered_part, skipping.STATS_DIR))
    cols = spark.read.parquet(clustered_part).columns
    assert "file_path" not in cols and "row_count" not in cols


@pytest.fixture(scope="module")
def bloom_part(spark):
    work = tempfile.mkdtemp(prefix="bloomtest_")
    table = f"{work}/part"
    part = spark.read.parquet(f"{SF_DIR}/part.parquet")
    part.repartition(16, "p_brand").write.mode("overwrite").parquet(table)
    skipping.write_bloom_manifest(spark, table, "p_brand")
    return table


def test_bloom_prunes_files_for_present_value(spark, bloom_part):
    kept, total = skipping.bloom_pruned_files(spark, bloom_part, "p_brand", "Brand#17")
    # 25 brands hashed into 16 buckets: empty buckets write no file, so
    # the file count lands a bit under 16.
    assert total >= 10
    # hash-clustered: one brand lives in ~1 file; bloom FP rate at 8192
    # bits / handful of brands per file is ~0, so pruning must bite hard
    assert 0 < len(kept) <= 3


def test_bloom_absent_value_prunes_everything_or_fp_filtered(spark, bloom_part):
    out = skipping.read_bloom_skipping(spark, bloom_part, "p_brand", "Brand#99")
    assert out.count() == 0  # no false positives can escape the residual filter


def test_bloom_scan_bit_identical_to_full_scan(spark, bloom_part):
    pruned = skipping.read_bloom_skipping(spark, bloom_part, "p_brand", "Brand#17")
    full = spark.read.parquet(bloom_part).where(F.col("p_brand") == "Brand#17")
    assert sorted(map(tuple, pruned.collect())) == sorted(map(tuple, full.collect()))


def test_bloom_unknown_column_keeps_all_files(spark, bloom_part):
    kept, total = skipping.bloom_pruned_files(spark, bloom_part, "p_type", "PROMO")
    assert len(kept) == total  # manifest is for p_brand: unknown => unprunable


def test_residual_filter_reaches_parquet_scan(spark, clustered_part):
    # The pruned scan must still push the residual predicate into the
    # parquet reader — skipping narrows the FILE LIST, pushdown narrows
    # the row groups inside the surviving files; both layers stack.
    plan = skipping.read_skipping(
        spark, clustered_part, "p_retailprice", lower=905.0, upper=912.0
    )._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    assert "GreaterThanOrEqual(p_retailprice,905.0)" in plan
    assert "LessThanOrEqual(p_retailprice" in plan  # tail elided in toString
    # and the scan's file index must hold the PRUNED list, not all 8 files
    import re
    n_paths = int(re.search(r"InMemoryFileIndex\((\d+) paths", plan).group(1))
    assert n_paths < 8


def test_zorder_box_pruning_beats_single_dimension(spark):
    from medallion_data_warehouse_on_azure_with_databricks_pyspark_spark.functions.layout import zorder_layout
    work = tempfile.mkdtemp(prefix="skipz_")
    table = f"{work}/part"
    part = spark.read.parquet(f"{SF_DIR}/part.parquet")
    zorder_layout(part, "p_size", "p_partkey", n_files=16).write.parquet(table)
    skipping.write_stats_manifest(spark, table, ["p_size", "p_partkey"])
    box = {"p_size": (10, 20), "p_partkey": (1, 50)}
    kept_box, total = skipping.pruned_files_multi(spark, table, box)
    kept_a, _ = skipping.pruned_files(spark, table, "p_size", 10, 20)
    kept_b, _ = skipping.pruned_files(spark, table, "p_partkey", 1, 50)
    # conjunctive pruning can only tighten each single-dimension prune,
    # and on a Z-ordered layout the box must actually skip files
    assert set(kept_box) <= set(kept_a) and set(kept_box) <= set(kept_b)
    assert 0 < len(kept_box) < total
    got = skipping.read_skipping_multi(spark, table, box)
    want = spark.read.parquet(table).where(
        (F.col("p_size").between(10, 20)) & (F.col("p_partkey").between(1, 50))
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_driver_side_pruning_equals_spark_path(spark, clustered_part):
    """r15: pruned_files_multi evaluates the manifest DRIVER-SIDE
    (pyarrow + _keep_py) — differential-test it against the Spark
    _keep_condition path over a sweep of predicate shapes (two-sided,
    one-sided, empty-intersection, uncollected column, multi-column
    boxes) so the twin implementations can never drift."""
    from medallion_data_warehouse_on_azure_with_databricks_pyspark_spark.sources.skipping import (
        _keep_condition,
        read_stats_manifest,
    )

    manifest = read_stats_manifest(spark, clustered_part)
    cases = [
        {"p_retailprice": (905.0, 912.0)},
        {"p_retailprice": (None, 910.0)},
        {"p_retailprice": (910.0, None)},
        {"p_retailprice": (1e9, None)},          # empty intersection
        {"p_name": ("a", "z")},                   # uncollected column
        {"p_retailprice": (905.0, 960.0), "p_size": (1, 25)},
        {"p_retailprice": (905.0, 960.0), "p_size": (None, None)},
    ]
    for predicates in cases:
        fast_kept, fast_total = skipping.pruned_files_multi(
            spark, clustered_part, predicates
        )
        keep = _keep_condition(manifest.columns, predicates)
        slow_kept = [
            r.file_path
            for r in manifest.where(keep).select("file_path").collect()
        ]
        assert fast_total == manifest.count()
        assert sorted(fast_kept) == sorted(slow_kept), predicates


def test_footer_manifest_equals_scan_manifest(spark, tmp_path):
    """r15: write_stats_manifest harvests parquet FOOTERS driver-side
    for exact numeric columns (zero Spark jobs).  The footer-built
    manifest must be VALUE-EQUAL to the distributed scan's on every
    file: same coverage, same min/max/null/row counts, same
    _metadata-style file_path keys."""
    t = str(tmp_path / "t")
    part = spark.read.parquet(f"{SF_DIR}/part.parquet")
    part.repartitionByRange(6, "p_retailprice").write.parquet(t)

    def rows_of(df):
        return sorted(
            tuple(r[c] for c in sorted(df.columns)) for r in df.collect()
        )

    cols = ["p_retailprice", "p_size"]
    fast = skipping.write_stats_manifest(spark, t, cols)  # auto -> footers
    fast_rows = rows_of(fast)
    slow = skipping.write_stats_manifest(spark, t, cols, source="scan")
    assert sorted(fast.columns) == sorted(slow.columns)
    assert fast_rows == rows_of(slow)
    # coverage: one row per data file, keyed exactly like _metadata
    data_files = {
        r[0] for r in spark.read.parquet(t)
        .select(F.col("_metadata.file_path")).distinct().collect()
    }
    assert {r.file_path for r in slow.collect()} == data_files


def test_footer_manifest_falls_back_for_strings_and_partition_columns(
    spark, tmp_path
):
    """Footer bounds for strings can be truncated and hive-partition
    columns aren't in the files — both must silently take the scan path
    and still produce a correct manifest."""
    t = str(tmp_path / "s")
    part = spark.read.parquet(f"{SF_DIR}/part.parquet")
    part.write.partitionBy("p_brand").parquet(t)
    # p_name is a string; p_brand is a partition column: both unanswerable
    # from footers, both must still yield full-coverage manifests
    for cols in (["p_name"], ["p_brand", "p_size"]):
        man = skipping.write_stats_manifest(spark, t, cols)
        n_files = (
            spark.read.parquet(t)
            .select(F.col("_metadata.file_path")).distinct().count()
        )
        assert man.count() == n_files
        assert {f"min__{c}" for c in cols} <= set(man.columns)


def test_keep_py_nan_stats_never_wrongly_prune():
    """Spark orders NaN above every value, Python NaN comparisons are
    always False — _keep_py must treat NaN stats as unknown (keep) so a
    file whose max stat is NaN can never be wrongly skipped; the
    residual filter keeps results exact either way."""
    from medallion_data_warehouse_on_azure_with_databricks_pyspark_spark.sources.skipping import (
        _keep_py,
    )

    cols = {"min__v", "max__v", "file_path"}
    nan = float("nan")
    # NaN max: Spark's NaN >= lower is TRUE (NaN sorts above all) — keep
    assert _keep_py({"min__v": 1.0, "max__v": nan}, cols, {"v": (5.0, None)})
    # all-NaN file (min also NaN): keep — the residual drops its rows
    assert _keep_py({"min__v": nan, "max__v": nan}, cols, {"v": (5.0, 9.0)})
    # sanity: real bounds still prune
    assert not _keep_py({"min__v": 1.0, "max__v": 2.0}, cols, {"v": (5.0, None)})


def test_driver_side_pruning_falls_back_on_incomparable_bounds(spark, clustered_part):
    """A bound type Python can't order against the stats (str vs float)
    raises TypeError driver-side; the call must fall through to Spark's
    coercion instead of erroring."""
    kept, total = skipping.pruned_files_multi(
        spark, clustered_part, {"p_retailprice": ("905.0", "912.0")}
    )
    assert total == 8 and len(kept) >= 1  # Spark coerces and prunes


def test_multi_predicate_on_uncollected_column_still_exact(spark, clustered_part):
    # p_brand has no stats in this manifest: it cannot prune, but the
    # residual filter must still apply.
    got = skipping.read_skipping_multi(
        spark, clustered_part,
        {"p_retailprice": (905.0, 912.0), "p_brand": ("Brand#13", "Brand#13")},
    )
    want = spark.read.parquet(clustered_part).where(
        (F.col("p_retailprice").between(905.0, 912.0)) & (F.col("p_brand") == "Brand#13")
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_bloom_manifest_maintained_across_partition_replace(spark, tmp_path):
    """VERDICT r11 ask #3: after a partition replace, an equality probe on
    the REPLACED partition must prune files again (stale rows gone, new
    files covered), bit-identical to the full scan."""
    from medallion_data_warehouse_on_azure_with_databricks_pyspark_spark.sources import (
        versioned as V,
    )

    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(g, f"k{g}_{i}", g * 10 + i) for g in range(3) for i in range(4)],
        "g int, key string, v int",
    )
    V.overwrite_versioned(df, path, partition_by=["g"], now=0.0)
    skipping.write_bloom_manifest(spark, path, "key")
    # pre-replace: the probe key lives only in g=1's file(s)
    kept0, total0 = skipping.bloom_pruned_files(spark, path, "key", "k1_0")
    assert 0 < len(kept0) < total0
    new = spark.createDataFrame(
        [(1, "fresh_a", 500), (1, "fresh_b", 501)], "g int, key string, v int"
    )
    V.replace_partitions(new, path, "g", expected_version=0, now=1.0)
    manifest = spark.read.parquet(os.path.join(path, skipping.BLOOM_DIR))
    # no stale rows: every manifest path exists on disk
    for r in manifest.select("file_path").collect():
        p = r["file_path"].removeprefix("file://").removeprefix("file:")
        assert os.path.exists(p), r["file_path"]
    # a key that only exists in the NEW files is findable and prunes
    kept, total = skipping.bloom_pruned_files(spark, path, "key", "fresh_a")
    assert 0 < len(kept) < total
    got = skipping.read_bloom_skipping(spark, path, "key", "fresh_a")
    assert [(r.g, r.key, r.v) for r in got.collect()] == [(1, "fresh_a", 500)]
    # the replaced partition's OLD key is gone (stale filter would FP it
    # into the read, where the residual filter hides it — but the file
    # list must not include unpruned stale paths either)
    assert skipping.read_bloom_skipping(spark, path, "key", "k1_0").count() == 0
    # untouched partition keys still prune and read exactly
    got2 = skipping.read_bloom_skipping(spark, path, "key", "k2_3")
    assert [(r.g, r.key, r.v) for r in got2.collect()] == [(2, "k2_3", 23)]
    # wide contract: probe results equal full-scan equality for every key
    all_keys = [r.key for r in spark.read.parquet(path).select("key").collect()]
    for k in all_keys:
        a = skipping.read_bloom_skipping(spark, path, "key", k).count()
        b = spark.read.parquet(path).where(F.col("key") == k).count()
        assert a == b, k


def test_pruned_reads_are_liveness_verified(spark, tmp_path):
    """r16 (VERDICT r15 noted the prune paths trusted the manifest
    blindly): a manifest row for a RETIRED file must never serve, and a
    LIVE file the manifest misses must always be kept — any missed
    sidecar maintenance anywhere becomes a perf non-event, never a
    wrong answer."""
    import os

    from pyspark.sql import functions as F

    from medallion_data_warehouse_on_azure_with_databricks_pyspark_spark.sources import (
        skipping,
    )

    t = str(tmp_path / "t")
    df = spark.range(1_000).select(
        F.col("id").cast("int").alias("a"), (F.col("id") * 2).alias("b")
    )
    df.repartitionByRange(4, "a").write.parquet(t)
    skipping.write_stats_manifest(spark, t, ["a"])
    skipping.write_bloom_manifest(spark, t, "a")
    # simulate missed maintenance: one described file retired, one new
    # file appended behind the manifests' back
    data = sorted(
        f for f in os.listdir(t)
        if f.endswith(".parquet") and not f.startswith(("_", "."))
    )
    retired = os.path.join(t, data[0])
    retired_rows = spark.read.parquet(retired).count()
    os.remove(retired)
    spark.range(5_000, 5_100).select(
        F.col("id").cast("int").alias("a"), (F.col("id") * 2).alias("b")
    ).coalesce(1).write.mode("append").parquet(t)
    # stats path: the unknown live file is KEPT even though no stats row
    # can match it; the retired file's row never serves
    kept, total = skipping.pruned_files_multi(spark, t, {"a": (5_000, 5_050)})
    assert total == 4  # 3 surviving described + 1 unknown live
    assert all(os.path.exists(k.replace("file:", "")) for k in kept)
    got = spark.read.option("basePath", t).parquet(
        *[k.replace("file:", "") for k in kept]
    ).filter("a BETWEEN 5000 AND 5050")
    assert got.count() == 51  # the appended rows are NOT missed
    assert not any(data[0] in k for k in kept)
    # bloom path: same rule
    kept_b, total_b = skipping.bloom_pruned_files(spark, t, "a", 5_010)
    assert total_b == 4
    assert not any(data[0] in k for k in kept_b)
    hit = spark.read.option("basePath", t).parquet(
        *[k.replace("file:", "") for k in kept_b]
    ).filter("a = 5010")
    assert hit.count() == 1
    # full read sanity: the table itself holds survivors + appended
    assert spark.read.parquet(t).count() == 1_000 - retired_rows + 100
