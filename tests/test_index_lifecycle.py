"""Index lifecycle: tombstone deletes take effect immediately on every
read path, and compaction folds them in physically while preserving
query bit-equality for surviving ids (takedown/TTL/re-crawl semantics
for the three on-disk index artifacts)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from medallion_data_warehouse_on_azure_with_databricks_pyspark_spark.operators import (
    dedup,
    index_maintenance,
    similarity,
)

DOCS = "/root/testdata/sf0.001/documents.parquet"
EMB = "/root/testdata/sf0.001/embeddings.parquet"

TOPK_KEY = lambda r: (r["query_id"], r["rank"], r["vec_id"], r["cosine"])


def _delete(spark, idx, ids, id_col):
    index_maintenance.delete_from_index(
        spark.createDataFrame([(i,) for i in ids], f"{id_col} long"), idx
    )


# ---------------------------------------------------------------------------
# MinHash
# ---------------------------------------------------------------------------

def test_minhash_delete_then_probe_and_compact(spark, tmp_path):
    docs = spark.read.parquet(DOCS)
    idx = dedup.build_minhash_index(docs, str(tmp_path / "idx"))
    # the shard IS the corpus -> every doc matches itself at jaccard 1.0
    shard = docs.limit(20)
    before = {
        (r["left_id"], r["right_id"])
        for r in dedup.minhash_pairs_against_index(shard, idx).collect()
    }
    assert before
    victims = sorted({r for _l, r in before})[:3]

    _delete(spark, idx, victims, "doc_id")
    after_delete = {
        (r["left_id"], r["right_id"])
        for r in dedup.minhash_pairs_against_index(shard, idx).collect()
    }
    assert after_delete == {p for p in before if p[1] not in set(victims)}

    index_maintenance.compact_index(spark, idx)
    assert not os.path.isdir(os.path.join(idx, "tombstones"))
    # physically gone from both tables, surviving pairs bit-identical
    bands = spark.read.parquet(f"{idx}/bands")
    assert bands.filter(F.col("doc_id").isin(victims)).count() == 0
    sh = spark.read.parquet(f"{idx}/shingles")
    assert sh.filter(F.col("doc_id").isin(victims)).count() == 0
    after_compact = {
        (r["left_id"], r["right_id"])
        for r in dedup.minhash_pairs_against_index(shard, idx).collect()
    }
    assert after_compact == after_delete


def test_minhash_compact_merges_replayed_append(spark, tmp_path):
    docs = spark.read.parquet(DOCS).limit(10)
    idx = dedup.build_minhash_index(docs, str(tmp_path / "idx"))
    new = spark.createDataFrame(
        [(9001, "a novel appended document about arrow batches and codegen")],
        "doc_id long, text string",
    )
    dedup.append_to_minhash_index(new, idx)
    dedup.append_to_minhash_index(new, idx)  # at-least-once replay
    bands = spark.read.parquet(f"{idx}/bands")
    assert bands.filter("doc_id = 9001").count() == 64  # 2x 32 bands

    index_maintenance.compact_index(spark, idx)
    bands = spark.read.parquet(f"{idx}/bands")
    assert bands.filter("doc_id = 9001").count() == 32  # folded to one copy
    assert (
        spark.read.parquet(f"{idx}/shingles").filter("doc_id = 9001").count()
        == 1
    )


# ---------------------------------------------------------------------------
# IVF
# ---------------------------------------------------------------------------

def test_ivf_delete_then_probe_and_compact(spark, tmp_path):
    from medallion_data_warehouse_on_azure_with_databricks_pyspark_spark.workload_llm import (
        _emb_queries,
    )

    emb = spark.read.parquet(EMB)
    queries = _emb_queries(emb)
    idx = similarity.build_ivf_index(emb, str(tmp_path / "ivf"))
    before = similarity.ivf_topk_against_index(
        queries, idx, k=10, nprobe=12
    ).collect()
    victims = sorted({r["vec_id"] for r in before})[:5]

    _delete(spark, idx, victims, "vec_id")
    after_delete = similarity.ivf_topk_against_index(
        queries, idx, k=10, nprobe=12
    ).collect()
    got_ids = {r["vec_id"] for r in after_delete}
    assert not got_ids & set(victims)
    assert after_delete  # other vectors still rank

    index_maintenance.compact_index(spark, idx)
    assert not os.path.isdir(os.path.join(idx, "tombstones"))
    lists = spark.read.parquet(f"{idx}/lists")
    assert lists.filter(F.col("vec_id").isin(victims)).count() == 0
    after_compact = similarity.ivf_topk_against_index(
        queries, idx, k=10, nprobe=12
    ).collect()
    assert sorted(map(TOPK_KEY, after_compact)) == sorted(
        map(TOPK_KEY, after_delete)
    )
    # hive layout survived compaction (partition pruning contract)
    subdirs = [
        d for d in os.listdir(os.path.join(idx, "lists"))
        if d.startswith("pivot_id=")
    ]
    assert subdirs


def test_ivf_compact_without_tombstones_is_bit_identical(spark, tmp_path):
    from medallion_data_warehouse_on_azure_with_databricks_pyspark_spark.workload_llm import (
        _emb_queries,
    )

    emb = spark.read.parquet(EMB)
    queries = _emb_queries(emb)
    idx = similarity.build_ivf_index(emb, str(tmp_path / "ivf"))
    before = similarity.ivf_topk_against_index(
        queries, idx, k=10, nprobe=12
    ).collect()
    index_maintenance.compact_index(spark, idx)
    after = similarity.ivf_topk_against_index(
        queries, idx, k=10, nprobe=12
    ).collect()
    assert sorted(map(TOPK_KEY, after)) == sorted(map(TOPK_KEY, before))


# ---------------------------------------------------------------------------
# LSH
# ---------------------------------------------------------------------------

@pytest.mark.slow  # opt-in tier: index-lifecycle e2e (pytest.ini)
def test_lsh_delete_then_probe_and_compact(spark, tmp_path):
    from medallion_data_warehouse_on_azure_with_databricks_pyspark_spark.workload_llm import (
        _LSH_TABLES, _emb_queries,
    )

    emb = spark.read.parquet(EMB)
    queries = _emb_queries(emb)
    idx = similarity.build_lsh_index(emb, str(tmp_path / "lsh"), _LSH_TABLES)
    before = similarity.lsh_topk_against_index(
        queries, idx, k=10, n_probes=4
    ).collect()
    victims = sorted({r["vec_id"] for r in before})[:5]

    _delete(spark, idx, victims, "vec_id")
    after_delete = similarity.lsh_topk_against_index(
        queries, idx, k=10, n_probes=4
    ).collect()
    assert not {r["vec_id"] for r in after_delete} & set(victims)
    assert after_delete

    index_maintenance.compact_index(spark, idx)
    assert not os.path.isdir(os.path.join(idx, "tombstones"))
    for table in ("buckets", "vectors"):
        live = spark.read.parquet(f"{idx}/{table}")
        assert live.filter(F.col("vec_id").isin(victims)).count() == 0
    after_compact = similarity.lsh_topk_against_index(
        queries, idx, k=10, n_probes=4
    ).collect()
    assert sorted(map(TOPK_KEY, after_compact)) == sorted(
        map(TOPK_KEY, after_delete)
    )


# ---------------------------------------------------------------------------
# shared semantics
# ---------------------------------------------------------------------------

def test_delete_is_idempotent_and_ignores_unknown_ids(spark, tmp_path):
    docs = spark.read.parquet(DOCS).limit(10)
    idx = dedup.build_minhash_index(docs, str(tmp_path / "idx"))
    ids = [r["doc_id"] for r in docs.limit(2).collect()]
    _delete(spark, idx, ids, "doc_id")
    _delete(spark, idx, ids + [123456789], "doc_id")  # repeat + unknown
    shard = docs
    pairs = dedup.minhash_pairs_against_index(shard, idx).collect()
    assert not {r["right_id"] for r in pairs} & set(ids)
    index_maintenance.compact_index(spark, idx)
    assert (
        spark.read.parquet(f"{idx}/bands")
        .filter(F.col("doc_id").isin(ids))
        .count()
        == 0
    )


def test_compact_unrecognized_manifest_raises(spark, tmp_path):
    import json

    bad = tmp_path / "bad"
    bad.mkdir()
    (bad / "meta.json").write_text(json.dumps({"id_col": "x", "version": 1}))
    with pytest.raises(ValueError, match="unrecognized"):
        index_maintenance.compact_index(spark, str(bad))


@pytest.mark.slow  # opt-in tier: index-lifecycle e2e (pytest.ini)
def test_pq_index_matches_inmemory_and_lifecycle(spark, tmp_path):
    """PQ artifact: index read path is bit-identical to the in-memory
    two-stage operator; append encodes with the STORED codebooks; delete
    excludes immediately; compaction folds physically and preserves
    results for surviving ids."""
    from medallion_data_warehouse_on_azure_with_databricks_pyspark_spark.operators import (
        index_maintenance,
        similarity,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    old = emb.filter(F.col("vec_id") < 400)
    new = emb.filter(F.col("vec_id") >= 400)
    books = similarity.pq_codebooks_from_corpus(emb, 8, 16)
    q = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    path = str(tmp_path / "pq_index")
    similarity.build_pq_index(old, path, books)
    similarity.append_to_pq_index(new, path)

    def rows(df):
        return sorted(tuple(r) for r in df.collect())

    inmem = similarity.pq_adc_rerank_topk(emb, q, books, k=10, shortlist=50)
    via_index = similarity.pq_topk_against_index(q, path, k=10, shortlist=50)
    assert rows(via_index) == rows(inmem)

    # delete: the tombstoned ids stop ranking immediately
    victims = {r[1] for r in rows(via_index)[:3]}
    index_maintenance.delete_from_index(
        spark.createDataFrame([(v,) for v in victims], "vec_id long"), path
    )
    after = rows(similarity.pq_topk_against_index(q, path, k=10, shortlist=50))
    assert not ({r[1] for r in after} & victims)

    # compaction folds tombstones physically, results unchanged
    index_maintenance.compact_index(spark, path)
    assert rows(
        similarity.pq_topk_against_index(q, path, k=10, shortlist=50)
    ) == after
    import os
    assert not os.path.isdir(os.path.join(path, "tombstones"))


@pytest.mark.slow  # opt-in tier: index-lifecycle e2e (pytest.ini)
def test_ivfpq_index_matches_inmemory_and_lifecycle(spark, tmp_path):
    """IVFADC artifact (residual codes hive-partitioned by list): read
    path is bit-identical to the in-memory residual operator under the
    same quantizer/codebooks; append encodes with the STORED pivots and
    codebooks; delete excludes immediately; compaction folds physically,
    keeps the hive layout, and preserves results for surviving ids."""
    emb = spark.read.parquet(EMB)
    old = emb.filter(F.col("vec_id") < 400)
    new = emb.filter(F.col("vec_id") >= 400)
    q = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    path = str(tmp_path / "ivfpq_index")
    similarity.build_ivfpq_index(old, path, n_subspaces=8, n_codes=8)
    similarity.append_to_ivfpq_index(new, path)

    def rows(df):
        return sorted(tuple(r) for r in df.collect())

    # in-memory twin under the SAME artifacts (old-corpus pivots +
    # old-corpus-trained codebooks — what the manifest pins)
    import json, os
    meta = json.load(open(os.path.join(path, "meta.json")))
    pivots = spark.read.parquet(os.path.join(path, "pivots"))
    inmem = similarity.ivfpq_residual_topk(
        emb, q, k=10, nprobe=4, shortlist=50,
        codebooks=meta["codebooks"], pivots=pivots,
    )
    via_index = similarity.ivfpq_topk_against_index(
        q, path, k=10, nprobe=4, shortlist=50
    )
    assert rows(via_index) == rows(inmem)

    victims = {r[1] for r in rows(via_index)[:3]}
    index_maintenance.delete_from_index(
        spark.createDataFrame([(v,) for v in victims], "vec_id long"), path
    )
    after = rows(similarity.ivfpq_topk_against_index(
        q, path, k=10, nprobe=4, shortlist=50
    ))
    assert not ({r[1] for r in after} & victims)

    index_maintenance.compact_index(spark, path)
    assert rows(similarity.ivfpq_topk_against_index(
        q, path, k=10, nprobe=4, shortlist=50
    )) == after
    assert not os.path.isdir(os.path.join(path, "tombstones"))
    # hive layout survives compaction (the partition-pruning contract)
    assert any(
        d.startswith("pivot_id=")
        for d in os.listdir(os.path.join(path, "codes"))
    )


@pytest.mark.slow  # opt-in tier: index-lifecycle e2e (pytest.ini)
def test_sq8_index_matches_inmemory_and_lifecycle(spark, tmp_path):
    """SQ8 artifact: index probe bit-identical to the in-memory two-stage
    operator under the manifest's frozen stats; append encodes with the
    STORED mins/steps; delete excludes immediately; compaction folds
    tombstones physically and preserves surviving results."""
    emb = spark.read.parquet(EMB)
    old = emb.filter(F.col("vec_id") < 400)
    new = emb.filter(F.col("vec_id") >= 400)
    stats = similarity.sq8_stats(emb)
    q = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    path = str(tmp_path / "sq8_index")
    similarity.build_sq8_index(old, path, stats=stats)
    similarity.append_to_sq8_index(new, path)

    def rows(df):
        return sorted(tuple(r) for r in df.collect())

    inmem = similarity.sq8_topk(emb, q, k=10, shortlist=40, stats=stats)
    via_index = similarity.sq8_topk_against_index(q, path, k=10, shortlist=40)
    assert rows(via_index) == rows(inmem)

    victims = {r[1] for r in rows(via_index)[:3]}
    _delete(spark, path, victims, "vec_id")
    after = rows(similarity.sq8_topk_against_index(q, path, k=10, shortlist=40))
    assert not ({r[1] for r in after} & victims)

    index_maintenance.compact_index(spark, path)
    assert rows(
        similarity.sq8_topk_against_index(q, path, k=10, shortlist=40)
    ) == after
    assert not os.path.isdir(os.path.join(path, "tombstones"))


def test_sq8_append_uses_frozen_stats(spark, tmp_path):
    """Stats trained on the BUILD corpus only: an appended vector outside
    the original per-dim range clamps (codes stay in [0,255]) and the
    manifest's stats are byte-identical before/after append."""
    import json

    emb = spark.read.parquet(EMB)
    path = str(tmp_path / "sq8f")
    similarity.build_sq8_index(emb.filter(F.col("vec_id") < 100), path)
    with open(os.path.join(path, "meta.json")) as f:
        meta_before = json.load(f)
    dim = len(meta_before["mins"])
    wild = spark.createDataFrame(
        [(10**9, [1e6] * dim)], "vec_id long, embedding array<float>"
    )
    similarity.append_to_sq8_index(wild, path)
    with open(os.path.join(path, "meta.json")) as f:
        meta_after = json.load(f)
    assert meta_after == meta_before
    code = (
        spark.read.parquet(os.path.join(path, "codes"))
        .filter(F.col("vec_id") == 10**9)
        .collect()[0]["sq8_code"]
    )
    assert all(c == 255 for c in code)  # clamped, never out of range
