from greenplum_dwh_spark.sources.landing import (  # noqa: F401
    load_landing_file,
    read_extract,
)
