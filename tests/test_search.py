

def test_rrf_fuse_combines_rank_lists(spark):
    """RRF: doc in both lanes beats docs in one lane at the same ranks;
    a doc missing from a lane contributes exactly +0.0 for it."""
    from pyspark.sql import functions as F

    from medallion_data_warehouse_on_azure_with_databricks_pyspark_spark.operators import (
        search,
    )

    sparse = spark.createDataFrame(
        [(0, 10, 1), (0, 11, 2), (0, 12, 3)], "query_id int, doc_id long, rank int"
    )
    dense = spark.createDataFrame(
        [(0, 11, 1), (0, 13, 2)], "query_id int, doc_id long, rank int"
    )
    out = {
        r["doc_id"]: (r["rrf"], r["rank"])
        for r in search.rrf_fuse([sparse, dense], k=10).collect()
    }
    assert out[11][0] == 1.0 / 62 + 1.0 / 61          # both lanes
    assert out[10][0] == 1.0 / 61                     # sparse only
    assert out[13][0] == 1.0 / 62                     # dense only
    assert out[12][0] == 1.0 / 63
    # fused order: 11 (two lanes) first, then 10, 13, 12
    assert [d for d, (_, rk) in sorted(out.items(), key=lambda kv: kv[1][1])] == [
        11, 10, 13, 12,
    ]


def test_rrf_fuse_rejects_empty_lane_list(spark):
    import pytest

    from medallion_data_warehouse_on_azure_with_databricks_pyspark_spark.operators import (
        search,
    )

    with pytest.raises(ValueError):
        search.rrf_fuse([])
