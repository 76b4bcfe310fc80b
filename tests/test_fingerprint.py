"""Winnowing fingerprints: exact pure-Python reference parity, the
paper's coverage guarantee, the containment case MinHash misses, and the
hot-fingerprint cap."""

from __future__ import annotations

from pyspark.sql import functions as F

from medallion_data_warehouse_on_azure_with_databricks_pyspark_spark.operators import (
    dedup,
    fingerprint,
)
from tests.conftest import SF_DIR

DOCS = f"{SF_DIR}/documents.parquet"


def _ref_fps(text: str, k: int = 5, w: int = 4) -> list[int]:
    """Independent reference: tokens → positional k-grams → polynomial
    char hash → window-w minima → order-preserving distinct."""
    toks = text.strip().lower().split()
    grams = [
        " ".join(toks[i : i + k]) for i in range(max(len(toks) - k, 0) + 1)
    ]
    hs = []
    for g in grams:
        acc = 0
        for c in g:
            acc = (acc * 257 + ord(c)) % ((1 << 31) - 1)
        hs.append(acc)
    mins = [min(hs[i : i + w]) for i in range(max(len(hs) - w, 0) + 1)]
    out: list[int] = []
    for m in mins:
        if m not in out:
            out.append(m)
    return out


def test_winnow_fingerprints_match_python_reference(spark):
    """Every document's fingerprint array must equal the independent
    reference bit-for-bit (order included — array_distinct preserves
    first-occurrence order, and so does the reference)."""
    docs = spark.read.parquet(DOCS)
    got = {
        r["doc_id"]: r["fps"]
        for r in fingerprint.winnow_fingerprints(docs).collect()
    }
    for r in docs.select("doc_id", "text").collect():
        assert got[r["doc_id"]] == _ref_fps(r["text"]), r["doc_id"]


def test_winnow_guarantee_shared_run_yields_shared_fingerprint(spark):
    """The winnowing guarantee (SIGMOD'03): two documents sharing a run of
    at least w + k - 1 tokens share at least one selected fingerprint."""
    k, w = 5, 4
    run = "alpha bravo charlie delta echo foxtrot golf hotel".split()
    assert len(run) >= w + k - 1
    a = "one two three " + " ".join(run) + " four five six"
    b = "seven eight nine ten " + " ".join(run) + " eleven"
    df = spark.createDataFrame([(1, a), (2, b)], "doc_id long, text string")
    fps = {
        r["doc_id"]: set(r["fps"])
        for r in fingerprint.winnow_fingerprints(df, k=k, w=w).collect()
    }
    assert fps[1] & fps[2], "shared run produced no shared fingerprint"


def test_containment_found_where_whole_doc_jaccard_misses(spark):
    """A short document pasted verbatim into a much larger one: whole-doc
    MinHash at threshold 0.8 must NOT pair them (true Jaccard is tiny),
    while fingerprint containment for the pair is ≈ 1.0 — the exact gap
    this operator exists to close."""
    inner = (
        "the quick brown fox jumps over the lazy dog while seven wizards "
        "brew quartz potions under a vexing midnight sky"
    )
    filler = " ".join(f"filler{i} padding{i} noise{i}" for i in range(60))
    big = filler + " " + inner + " " + " ".join(
        f"tail{i} extra{i}" for i in range(40)
    )
    df = spark.createDataFrame(
        [(1, inner), (2, big)], "doc_id long, text string"
    )
    minhash = dedup.minhash_dedup_pairs(df, threshold=0.8).collect()
    assert minhash == []

    pairs = fingerprint.fingerprint_overlap_pairs(df, min_shared=3).collect()
    assert len(pairs) == 1
    p = pairs[0]
    assert (p["left_id"], p["right_id"]) == (1, 2)
    assert p["containment"] == 1.0, p


def test_max_fp_freq_drops_boilerplate(spark):
    """A fingerprint appearing in more than max_fp_freq docs must not
    generate candidate pairs (the hot-bucket cap)."""
    boiler = (
        "standard license header apache version two point zero granted "
        "to every file in this repository without exception"
    )
    rows = [(i, boiler + f" unique{i} suffix{i} token{i}") for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    capped = fingerprint.fingerprint_overlap_pairs(
        df, min_shared=1, max_fp_freq=3
    ).collect()
    uncapped = fingerprint.fingerprint_overlap_pairs(
        df, min_shared=1
    ).collect()
    assert len(uncapped) == 15  # all C(6,2) pairs share the boilerplate
    assert len(capped) == 0  # every shared print exceeds the cap


def test_short_doc_single_gram(spark):
    """Docs shorter than k tokens yield exactly one (short) gram and one
    fingerprint — the shingle-family guard, no empty arrays anywhere."""
    df = spark.createDataFrame(
        [(1, "tiny doc"), (2, "tiny doc")], "doc_id long, text string"
    )
    fps = {
        r["doc_id"]: r["fps"]
        for r in fingerprint.winnow_fingerprints(df).collect()
    }
    assert len(fps[1]) == 1 and fps[1] == fps[2]
    pairs = fingerprint.fingerprint_overlap_pairs(df, min_shared=1).collect()
    assert [(p["left_id"], p["right_id"]) for p in pairs] == [(1, 2)]
    assert pairs[0]["containment"] == 1.0


def test_duplicated_spans_matches_python_reference(spark):
    """Crafted cross-doc and intra-doc repeats: spans, offsets, and the
    interval merge must match an independent reference exactly."""
    shared = "alpha bravo charlie delta echo foxtrot golf hotel india"
    d1 = "one two three " + shared + " x1 y1 z1"
    d2 = "seven eight " + shared + " p q r s"
    d3 = ("repeatme one two three four five middlefiller junk "
          "repeatme one two three four five end")
    df = spark.createDataFrame(
        [(1, d1), (2, d2), (3, d3)], "doc_id long, text string"
    )
    got = sorted(
        (r["doc_id"], r["span_start"], r["span_end"], r["span_tokens"])
        for r in fingerprint.duplicated_spans(df, k=5).collect()
    )
    # docs 1/2: the 9-token shared run at their own offsets; doc 3: the
    # 6-token internal repeat twice ("one two three" inside d1/d3 is only
    # 3 tokens — below k, correctly NOT flagged on its own).
    assert got == [
        (1, 3, 11, 9),
        (2, 2, 10, 9),
        (3, 0, 5, 6),
        (3, 8, 13, 6),
    ], got


def test_duplicated_spans_below_k_not_flagged(spark):
    """Shared runs shorter than k tokens produce no spans (the granularity
    contract of the k-gram relaxation)."""
    df = spark.createDataFrame(
        [(1, "common four token run aaa bbb ccc"),
         (2, "xxx yyy common four token run zzz")],
        "doc_id long, text string",
    )
    assert fingerprint.duplicated_spans(df, k=5).collect() == []


def test_duplicated_spans_short_doc_end_is_capped(spark):
    """A duplicated doc shorter than k must report a span capped at its
    own last token index, never past the end of the document."""
    df = spark.createDataFrame(
        [(1, "tiny doc"), (2, "tiny doc")], "doc_id long, text string"
    )
    got = sorted(
        (r["doc_id"], r["span_start"], r["span_end"], r["span_tokens"])
        for r in fingerprint.duplicated_spans(df, k=5).collect()
    )
    assert got == [(1, 0, 1, 2), (2, 0, 1, 2)], got


def test_duplication_stats_rollup(spark):
    """Rollup invariants on crafted docs: merged-span union sizes, zeros
    for clean docs, and ratio = dup_tokens/n_tokens."""
    shared = "alpha bravo charlie delta echo foxtrot golf hotel india"
    d1 = "one two three " + shared + " x1 y1 z1"          # 18 tokens, 9 dup
    d2 = "seven eight " + shared + " p q r s"             # 17 tokens, 9 dup
    d3 = "a completely clean document with no repeats at all here"
    df = spark.createDataFrame(
        [(1, d1), (2, d2), (3, d3)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r.asDict()
        for r in fingerprint.duplication_stats(df, k=5).collect()
    }
    assert len(got) == 3  # every doc appears, flagged or not
    assert (got[1]["dup_tokens"], got[1]["n_spans"]) == (9, 1)
    assert (got[2]["dup_tokens"], got[2]["n_spans"]) == (9, 1)
    assert (got[3]["dup_tokens"], got[3]["n_spans"], got[3]["dup_ratio"]) == (
        0, 0, 0.0,
    )
    assert got[1]["dup_ratio"] == 9 / got[1]["n_tokens"]


def test_remove_duplicated_spans_cuts_every_occurrence(spark):
    """Two docs share a 6-token boilerplate run (k=5 ⇒ flagged); both
    lose exactly that run, a third untouched doc passes through with the
    tokenizer's canonical (lowercased, space-joined) form."""
    boiler = "please subscribe to our newsletter for more updates"
    a = "alpha beta " + boiler + " gamma delta"
    b = boiler + " epsilon zeta eta theta iota"
    c = "Totally Unique   Content here"
    df = spark.createDataFrame(
        [(1, a), (2, b), (3, c)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r.asDict()
        for r in fingerprint.remove_duplicated_spans(df, k=5).collect()
    }
    assert got[1]["clean_text"] == "alpha beta gamma delta"
    assert got[1]["removed_tokens"] == len(boiler.split())
    assert got[2]["clean_text"] == "epsilon zeta eta theta iota"
    assert got[3]["clean_text"] == "totally unique content here"
    assert got[3]["removed_tokens"] == 0
    for r in got.values():  # removed + kept == original token count
        assert r["n_tokens"] == r["removed_tokens"] + len(
            r["clean_text"].split() if r["clean_text"] else []
        )


def test_remove_duplicated_spans_fully_covered_doc_empties(spark):
    """A doc that IS the boilerplate (duplicated in full) cleans to the
    empty string but still appears in the output."""
    t = "one two three four five"
    df = spark.createDataFrame(
        [(1, t), (2, t)], "doc_id long, text string"
    )
    rows = {
        r["doc_id"]: r.asDict()
        for r in fingerprint.remove_duplicated_spans(df, k=5).collect()
    }
    assert set(rows) == {1, 2}
    for r in rows.values():
        assert r["clean_text"] == ""
        assert r["removed_tokens"] == 5 and r["n_tokens"] == 5
