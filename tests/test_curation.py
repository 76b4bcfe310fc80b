"""Corpus-curation operator tests that need bespoke fixtures (the
registered curation queries are oracle-verified in test_workload_oracle).
"""

from __future__ import annotations


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
