from greenplum_dwh_spark.etl.normalize import normalize_transactions  # noqa: F401
