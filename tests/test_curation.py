"""Corpus-curation operator tests that need bespoke fixtures (the
registered curation queries are oracle-verified in test_workload_oracle).
"""

from __future__ import annotations

import pytest


def test_decontaminate_flags_planted_overlap(spark):
    """Planted contamination: a corpus doc embedding a benchmark sentence
    is flagged; an unrelated doc is not; overlap counting respects n-gram
    boundaries (n-1 shared words do not flag)."""
    from medallion_data_warehouse_on_azure_with_databricks_pyspark_spark.operators import (
        curation,
    )

    bench = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog tonight")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [
            # contains the full benchmark sentence → many shared 5-grams
            (10, "intro words then the quick brown fox jumps over the lazy dog tonight and more"),
            # shares only a 4-word run ("quick brown fox jumps") → no 5-gram hit
            (11, "a quick brown fox jumps somewhere else entirely different text"),
            # disjoint vocabulary
            (12, "completely unrelated content about databases and queries"),
        ],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in curation.decontaminate_flags(corpus, bench, n=5).collect()
    }
    assert rows[10]["contaminated"] and rows[10]["n_contaminated_grams"] >= 6
    assert not rows[11]["contaminated"]
    assert not rows[12]["contaminated"]
    # totals are the doc's own distinct n-gram count
    assert rows[12]["n_grams"] == 3  # 7 tokens → 3 five-grams


def test_gopher_quality_rules(spark):
    """Each Gopher rule (Rae et al. 2021 defaults) trips on its own
    crafted violation while a clean document passes everything."""
    from medallion_data_warehouse_on_azure_with_databricks_pyspark_spark.operators.curation import (
        gopher_quality_flags,
    )

    base = ("the quick brown fox jumps over and over that lazy dog to have "
            "fun with friends near be water ") * 3  # 57 words, en function words
    rows = [
        (0, base),                                          # passes all
        (1, "the and of to be that have with short"),       # < 50 words
        (2, " ".join(["extraordinarily"] * 60) + " the and"),  # mean len > 10
        (3, base + " " + " ".join(["#"] * 12)),             # symbol ratio
        (4, "\n".join("- " + w for w in base.split()[:55])),  # bullet lines
        (5, "\n".join(w + "..." for w in base.split()[:55])),  # ellipsis lines
        (6, base.split(" ", 1)[1] + " " + " ".join(str(i) for i in range(40))),
        (7, " ".join(f"tok{i}" for i in range(60))),        # no required words
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in gopher_quality_flags(df).collect()}
    assert got[0]["gopher_pass"] is True
    expect_broken = {
        1: "ok_word_count",
        2: "ok_mean_word_len",
        3: "ok_symbol_ratio",
        4: "ok_bullet_lines",
        5: "ok_ellipsis_lines",
        6: "ok_alpha_words",
        7: "ok_required_words",
    }
    for did, flag in expect_broken.items():
        assert got[did][flag] is False, (did, flag, got[did])
        assert got[did]["gopher_pass"] is False, did


def test_cap_per_group_deterministic_and_binding(spark):
    """Per-group cap: exactly min(cap, group size) survivors per group,
    identical under repartitioning (hash-ranked, not scan-ordered), and
    survivors are a subset of the input."""
    from medallion_data_warehouse_on_azure_with_databricks_pyspark_spark.operators.curation import (
        cap_per_group,
    )
    from pyspark.sql import functions as F

    rows = [(i, f"s{i % 3}", f"t{i}") for i in range(40)]  # 3 groups: 14/13/13
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    kept = cap_per_group(df, cap=5)
    counts = {
        r["source"]: r["c"]
        for r in kept.groupBy("source").agg(F.count("*").alias("c")).collect()
    }
    assert counts == {"s0": 5, "s1": 5, "s2": 5}
    ids = sorted(r["doc_id"] for r in kept.collect())
    ids_reparted = sorted(
        r["doc_id"] for r in cap_per_group(df.repartition(7), cap=5).collect()
    )
    assert ids == ids_reparted
    assert set(ids) <= set(range(40))

    # cap larger than every group passes everything through
    assert cap_per_group(df, cap=100).count() == 40


def test_hashed_classifier_score_exact_fold(spark):
    """Crafted corpus: score equals the hand-computed feature-hash mean;
    keep flag respects the threshold."""
    from medallion_data_warehouse_on_azure_with_databricks_pyspark_spark.operators.curation import (
        hashed_classifier_score,
    )

    M = (1 << 31) - 1

    def poly(s):
        acc = 0
        for c in s:
            acc = (acc * 257 + ord(c)) % M
        return acc

    weights = [((b * 13 + 5) % 64 - 32) / 64.0 for b in range(32)]
    text = "alpha beta gamma"
    feats = ["alpha", "beta", "gamma", "alpha beta", "beta gamma"]
    expected = 0.0
    for f in feats:
        expected += weights[poly(f) % 32]
    expected /= len(feats)
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    (r,) = hashed_classifier_score(df, weights, threshold=expected).collect()
    assert r["n_features"] == 5
    assert r["clf_score"] == expected
    assert r["keep"] is True  # >= threshold (equality)


def test_hashed_classifier_rejects_empty_weights(spark):
    from medallion_data_warehouse_on_azure_with_databricks_pyspark_spark.operators.curation import (
        hashed_classifier_score,
    )

    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        hashed_classifier_score(df, [])


def test_ngram_lm_fluency_repeated_phrase_beats_gibberish(spark):
    """Self-trained bigram LM: a document whose bigrams dominate the corpus
    scores higher than one made of transitions seen nowhere else; a
    one-token doc scores NULL."""
    from medallion_data_warehouse_on_azure_with_databricks_pyspark_spark.operators.curation import (
        ngram_lm_fluency,
    )

    common = "the quick brown fox"
    rows = [(i, common) for i in range(5)] + [
        (10, "zyx wvu tsr qpo"),   # unique transitions
        (11, "single"),            # no bigrams
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in ngram_lm_fluency(df).collect()}
    assert out[0]["lm_score"] > out[10]["lm_score"]
    assert out[11]["n_bigrams"] == 0 and out[11]["lm_score"] is None
    # the five copies score identically (shared statistics)
    assert {out[i]["lm_score"] for i in range(5)} == {out[0]["lm_score"]}


def test_leakage_safe_splits_cluster_never_straddles(spark):
    """The leakage invariant: every member of a near-dup cluster gets the
    SAME split; singletons keep per-id hashing."""
    from medallion_data_warehouse_on_azure_with_databricks_pyspark_spark.operators.curation import (
        assign_split,
        leakage_safe_splits,
    )

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(20)], "doc_id long, text string"
    )
    # two clusters: {1, 7, 13} and {4, 18}
    pairs = spark.createDataFrame(
        [(1, 7), (7, 13), (4, 18)], "id_a long, id_b long"
    )
    out = {r["doc_id"]: (r["split_group"], r["split"])
           for r in leakage_safe_splits(docs, pairs).collect()}
    assert {out[i] for i in (1, 7, 13)} == {out[1]}      # one split each
    assert out[1][0] == 1 and out[4][0] == 4             # min-id labels
    assert {out[i] for i in (4, 18)} == {out[4]}
    # singletons match plain per-id assignment exactly
    plain = {r["doc_id"]: r["split"] for r in assign_split(docs).collect()}
    for i in range(20):
        if i not in (1, 7, 13, 4, 18):
            assert out[i] == (i, plain[i])
