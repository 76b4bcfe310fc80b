"""Medallion: a PySpark-native analytics engine.

A library-shaped re-implementation of the capabilities of the reference
medallion data warehouse (``sushish/Medallion-Data-Warehouse-on-Azure-with-
Databricks-PySpark``): streaming bronze ingest, silver cleanse/derive
operators, gold dimensional modeling (SCD Type 1 / Type 2 merges, star-schema
fact builds), catalog UDFs, declarative pipelines with data-quality
expectations — plus LLM-data-pipeline extensions (dedup, similarity search,
text analysis, multimodal plumbing) designed for 100 TB scale.

Everything is expressed Spark-first: DataFrame/SQL logical plans optimized by
Catalyst, broadcast hints on dimension joins, partitioned writes, AQE-aware
shuffle sizing. No RDD code, no driver-side row loops.

Import the subpackages directly::

    from medallion_data_warehouse_on_azure_with_databricks_pyspark_spark import session
    spark = session.get_spark()
"""

__version__ = "0.1.0"
