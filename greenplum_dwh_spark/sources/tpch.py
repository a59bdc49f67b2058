"""Typed loaders for the driver's TPC-H-ish parquet tables
(TESTDATA.md): region nation customer supplier part orders lineitem
events documents embeddings.

The only normalization applied is the events ``ts`` column: the file
stores TIMESTAMP(NANOS) which Spark reads as a nanosecond long (see
session.py nanosAsLong); we floor-divide to micros — identical to
DuckDB's TIMESTAMP_NS→TIMESTAMP cast, so oracle comparisons line up.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = ["region", "nation", "customer", "supplier", "part",
               "orders", "lineitem", "events", "documents", "embeddings"]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from greenplum_dwh_spark.shipping import ensure_confs
    ensure_confs(spark)  # foreign sessions: ns-parquet + UTC tz
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # integer division — a double division of an int64 ns value
        # loses precision beyond 2^53 and shifts microseconds by ±1
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


class Tables:
    """Lazy per-sf_dir table accessor: ``Tables(spark, sf_dir).lineitem``."""

    def __init__(self, spark: SparkSession, sf_dir: str):
        self._spark, self._dir = spark, sf_dir
        self._cache: dict[str, DataFrame] = {}

    def __getattr__(self, name: str) -> DataFrame:
        if name in TABLE_NAMES:
            # memoize: joins need column refs from the SAME DataFrame
            # instance (t.lineitem.l_orderkey after a second t.lineitem
            # access would be an unresolvable attribute)
            cache = object.__getattribute__(self, "_cache")
            if name not in cache:
                cache[name] = load_table(self._spark, self._dir, name)
            return cache[name]
        raise AttributeError(name)
