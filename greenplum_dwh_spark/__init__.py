"""greenplum_dwh_spark — a PySpark-native analytics engine.

Re-implements, Spark-first, the full capability surface of the reference
Greenplum bank-card fraud warehouse (SergeyMaslikhov/GreenPlum_DWH):

- star-schema data model with SCD1/SCD2 dimension maintenance
  (reference: sql_scripts/DDL.sql, sql_scripts/ETL.sql)
- fraud-detection data mart with 4 rules, incl. a per-client sequential
  state machine (reference: sql_scripts/Data_mart.sql)
- ingestion from Excel/CSV/Parquet landing extracts
  (reference: python_scripts/insert_from_excel.py)
- report visualization pivot (reference: python_scripts/plot_report.py)

plus large-scale training-data-pipeline operators (dedup, similarity
search, text analysis, multimodal columns) designed for 100 TB workloads.

Everything is declared through the DataFrame / Spark SQL API so Catalyst
and AQE choose physical plans; Python only orchestrates, except where
semantics require per-group state (applyInPandas).
"""

__version__ = "0.1.0"

from greenplum_dwh_spark.session import get_spark, stop_spark  # noqa: F401
