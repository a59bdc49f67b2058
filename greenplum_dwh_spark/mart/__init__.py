from greenplum_dwh_spark.mart.report import add_report_data  # noqa: F401
