"""Parquet-backed warehouse table store.

The reference relies on Greenplum heap tables for in-place UPDATEs of
dimensions (DDL.sql:69 "heap table due to update necessity") and
append-only zlib tables for landing/fact/report (DDL.sql:37-39,53-58,
162-167). Spark-side:

- **append tables** (landing, fact, report): plain parquet ``append``
  writes; the fact is written ``partitionBy(trans_dt_day)`` which is the
  Spark equivalent of the daily RANGE partitioning (DDL.sql:60-67) and
  gives Catalyst static + dynamic partition pruning.
- **versioned tables** (dimensions): UPDATE/MERGE is emulated with
  whole-table copy-on-write — the merged result is written as a new
  ``v=N`` directory and a pointer file is flipped. This is exactly the
  mechanism Delta/Iceberg use at file granularity; dimensions are small
  relative to facts (reference: ≤101 rows vs all transactions) so
  table-granularity rewrite is the right local trade-off, and the call
  sites are written against a MERGE-shaped API so swapping in Delta
  (`MERGE INTO`) on a real cluster is a one-module change.

At 100 TB the fact table never rewrites (append-only + partition
pruning); only dims rewrite, and dims stay broadcast-sized.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_POINTER = "_current_version"


class TableStore:
    def __init__(self, spark: SparkSession, base_dir: str):
        self.spark = spark
        self.base_dir = base_dir
        os.makedirs(base_dir, exist_ok=True)

    # ---- generic helpers -------------------------------------------------
    def _path(self, name: str) -> str:
        return os.path.join(self.base_dir, name)

    def exists(self, name: str) -> bool:
        return os.path.isdir(self._path(name))

    def drop(self, name: str) -> None:
        """DROP TABLE IF EXISTS (DDL.sql:2-12, ETL.sql:6-9)."""
        shutil.rmtree(self._path(name), ignore_errors=True)

    @staticmethod
    def _empty(spark: SparkSession, schema: T.StructType) -> DataFrame:
        return spark.createDataFrame([], schema)

    # ---- append tables ---------------------------------------------------
    def init_append(self, name: str, schema: T.StructType,
                    partition_cols: list[str] | None = None) -> None:
        if not self.exists(name):
            w = self._empty(self.spark, schema).write.mode("overwrite")
            if partition_cols:
                w = w.partitionBy(*partition_cols)
            w.parquet(self._path(name))

    def append(self, name: str, df: DataFrame,
               partition_cols: list[str] | None = None) -> None:
        w = df.write.mode("append")
        if partition_cols:
            w = w.partitionBy(*partition_cols)
        w.parquet(self._path(name))

    def truncate(self, name: str, schema: T.StructType) -> None:
        """TRUNCATE (ETL.sql:447) — drop + re-init empty."""
        self.drop(name)
        self.init_append(name, schema)

    # ---- versioned (copy-on-write) tables --------------------------------
    def _current_version(self, name: str) -> int:
        ptr = os.path.join(self._path(name), _POINTER)
        if not os.path.isfile(ptr):
            return -1
        with open(ptr) as f:
            return int(f.read().strip())

    def init_versioned(self, name: str, schema: T.StructType) -> None:
        if self._current_version(name) < 0:
            self.overwrite_versioned(name, self._empty(self.spark, schema))

    def overwrite_versioned(self, name: str, df: DataFrame) -> None:
        """Write df as the new current version (copy-on-write commit)."""
        v = self._current_version(name) + 1
        path = os.path.join(self._path(name), f"v={v}")
        df.write.mode("overwrite").parquet(path)
        ptr = os.path.join(self._path(name), _POINTER)
        tmp = ptr + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(v))
        os.replace(tmp, ptr)  # atomic pointer flip = commit
        # vacuum: keep only previous version for debugging
        for d in os.listdir(self._path(name)):
            if d.startswith("v=") and int(d[2:]) < v - 1:
                shutil.rmtree(os.path.join(self._path(name), d),
                              ignore_errors=True)

    # ---- reads -----------------------------------------------------------
    def read(self, name: str) -> DataFrame:
        v = self._current_version(name)
        if v >= 0:
            return self.spark.read.parquet(
                os.path.join(self._path(name), f"v={v}"))
        return self.spark.read.parquet(self._path(name))

    def read_version(self, name: str, version: int) -> DataFrame:
        """Time travel on a versioned table (the retained previous
        version — Delta-style ``VERSION AS OF`` at our vacuum depth)."""
        path = os.path.join(self._path(name), f"v={version}")
        if not os.path.isdir(path):
            raise ValueError(
                f"version {version} of {name} not available "
                f"(current={self._current_version(name)}, vacuum keeps 2)")
        return self.spark.read.parquet(path)

    def current_version(self, name: str) -> int:
        return self._current_version(name)


def with_day_partition(df: DataFrame,
                       ts_col: str = "trans_date") -> DataFrame:
    """Add the physical day-partition column (DDL.sql:60-67 analogue)."""
    return df.withColumn("trans_dt_day", F.to_date(F.col(ts_col)))
