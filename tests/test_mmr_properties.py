"""Property tests (hypothesis) for the pure MMR greedy kernel — the one
piece of selection logic whose correctness the distributed lane inherits
verbatim (the pandas UDF calls ``mmr_greedy`` per query row)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from medallion_data_warehouse_on_azure_with_databricks_pyspark_spark.operators.similarity import (
    mmr_greedy,
)


def _case():
    """Random pool: 1..12 candidates with finite rels + full pairwise sims."""
    return st.integers(2, 12).flatmap(
        lambda n: st.tuples(
            st.just(n),
            st.lists(
                st.floats(-1.0, 1.0, allow_nan=False), min_size=n, max_size=n
            ),
            st.lists(
                st.floats(-1.0, 1.0, allow_nan=False),
                min_size=n * (n - 1) // 2,
                max_size=n * (n - 1) // 2,
            ),
        )
    )


def _build(n, rels, simvals):
    cands = [{"vid": i, "rel": rels[i]} for i in range(n)]
    sims, k = [], 0
    for a in range(n):
        for b in range(a + 1, n):
            sims.append({"__a": a, "__b": b, "__sim": simvals[k]})
            k += 1
    return cands, sims


@settings(max_examples=200, deadline=None)
@given(_case(), st.integers(1, 12), st.floats(0.0, 1.0, allow_nan=False))
def test_mmr_greedy_structural_invariants(case, k, lam):
    n, rels, simvals = case
    cands, sims = _build(n, rels, simvals)
    out = mmr_greedy(cands, sims, k, lam)
    ids = [v for v, _, _ in out]
    # selection is a prefix-ranked subset of the pool, no repeats
    assert len(out) == min(k, n)
    assert len(set(ids)) == len(ids)
    assert set(ids) <= set(range(n))
    assert [r for _, _, r in out] == list(range(1, len(out) + 1))
    # emitted rel is the candidate's own rel
    assert all(rel == rels[v] for v, rel, _ in out)
    # first pick is the pure-relevance argmax (ties -> smaller id)
    best = min(range(n), key=lambda i: (-rels[i], i))
    assert ids[0] == best


@settings(max_examples=100, deadline=None)
@given(_case(), st.integers(1, 12))
def test_mmr_greedy_lam1_is_relevance_order(case, k):
    n, rels, simvals = case
    cands, sims = _build(n, rels, simvals)
    out = mmr_greedy(cands, sims, k, 1.0)
    want = sorted(range(n), key=lambda i: (-rels[i], i))[: min(k, n)]
    assert [v for v, _, _ in out] == want


@settings(max_examples=100, deadline=None)
@given(_case(), st.integers(1, 12), st.floats(0.0, 1.0, allow_nan=False),
       st.randoms(use_true_random=False))
def test_mmr_greedy_invariant_to_input_order(case, k, lam, rng):
    n, rels, simvals = case
    cands, sims = _build(n, rels, simvals)
    out1 = mmr_greedy(cands, sims, k, lam)
    rng.shuffle(cands)
    rng.shuffle(sims)
    # either pair orientation must also resolve identically
    flipped = [
        {"__a": s["__b"], "__b": s["__a"], "__sim": s["__sim"]} for s in sims
    ]
    assert mmr_greedy(cands, sims, k, lam) == out1
    assert mmr_greedy(cands, flipped, k, lam) == out1
