"""Distributed PCA: exact moment aggregation, deterministic solve,
planted-direction recovery, and the ordered-fold projection."""

from __future__ import annotations

import math

import numpy as np
import pytest

from medallion_data_warehouse_on_azure_with_databricks_pyspark_spark.operators import (
    decomposition as D,
)

EMB = "/root/testdata/sf0.001/embeddings.parquet"


def test_gram_moments_exact_vs_numpy_any_partitioning(spark):
    """The fixed-point moment sums are integer-exact and therefore
    identical under ANY partitioning of the corpus."""
    emb = spark.read.parquet(EMB)
    X = np.stack([r["embedding"] for r in emb.collect()]).astype(np.float64)
    Q = np.floor(X * D.DEFAULT_FP).astype(np.int64)
    want_g = Q.T @ Q
    want_s = Q.sum(axis=0)
    for df in (emb, emb.repartition(17), emb.coalesce(1)):
        rows = D.gram_moments(df).collect()
        got = {(r["i"], r["j"]): int(r["s"]) for r in rows}
        assert got[(-1, -1)] == len(X)
        for i in range(64):
            assert got[(i, -1)] == want_s[i]
            for j in range(i, 64):
                assert got[(i, j)] == want_g[i, j]


def test_power_iteration_recovers_planted_direction(spark):
    """On an anisotropic corpus (one dominant planted direction) the
    deterministic power method converges: |cos| with the numpy top
    eigenvector > 0.9999."""
    rng = np.random.default_rng(7)
    d = 64
    u = rng.normal(size=d)
    u /= np.linalg.norm(u)
    X = rng.normal(scale=0.02, size=(400, d)) + np.outer(
        rng.normal(scale=0.3, size=400), u
    )
    emb = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(X)],
        "vec_id long, embedding array<float>",
    )
    fit = D.top_principal_component(emb, iters=40)
    C = np.cov(X.T, bias=True)
    top = np.linalg.eigh(C)[1][:, -1]
    cos = abs(float(top @ np.array(fit["pc"])))
    assert cos > 0.9999
    # the mean is quantized-exact to within the fp grid
    assert np.allclose(fit["mu"], X.mean(axis=0), atol=1.5 / D.DEFAULT_FP)


def test_projection_is_centered_ordered_fold(spark):
    """project_onto computes sum_i (x_i - mu_i) * d_i in ascending-i
    order from a 0.0 seed — verified against the identical pure-Python
    fold; and projections of the corpus onto its own top PC are
    mean-centered (sum of coords ~ 0 for the exact mean)."""
    emb = spark.read.parquet(EMB).limit(50)
    fit = D.top_principal_component(emb, iters=5)
    got = {
        r["vec_id"]: r["pc_coord"]
        for r in D.project_onto(emb, fit["pc"], fit["mu"]).collect()
    }
    for r in emb.collect():
        acc = 0.0
        for i in range(64):
            acc = acc + (float(r["embedding"][i]) - fit["mu"][i]) * fit["pc"][i]
        assert got[r["vec_id"]] == acc  # bit-equal, not approx


def test_unit_direction_and_empty_corpus(spark):
    emb = spark.read.parquet(EMB)
    fit = D.top_principal_component(emb, iters=8)
    assert math.isclose(
        sum(x * x for x in fit["pc"]), 1.0, rel_tol=0, abs_tol=1e-12
    )
    with pytest.raises(ValueError, match="empty corpus"):
        D.top_principal_component(emb.filter("vec_id < 0"))
