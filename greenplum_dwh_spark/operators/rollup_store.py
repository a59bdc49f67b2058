"""Continuous time-bucket aggregate (hypertable-rollup style).

TimescaleDB-like continuous aggregates on Spark primitives: the rollup
table holds *partial* algebraic aggregates (count/sum are mergeable),
so maintenance is append-only — each incoming batch appends one tiny
partial row-set per touched bucket, never rewriting history. Reads
finish the merge with a groupBy; a periodic ``compact`` folds the
partials down to one row per bucket.

Scale shape: maintenance cost is O(batch) regardless of history size
(the classic reason continuous aggregates exist); compaction is a
bucket-partitioned shuffle over the rollup only, which is orders
smaller than the raw events. Exactness: partials are scaled-int sums,
so merge order never changes results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from greenplum_dwh_spark.tablestore import TableStore

ROLLUP_SCHEMA = T.StructType([
    T.StructField("bucket_start", T.TimestampType(), False),
    T.StructField("event_type", T.StringType(), False),
    T.StructField("n", T.LongType(), False),
    T.StructField("sum_value_c", T.LongType(), False),  # cents (exact)
])


class HourlyRollup:
    """Continuous hourly rollup of an events-shaped stream
    (ts, event_type, value)."""

    TABLE = "events_rollup_hourly"

    def __init__(self, store: TableStore):
        self.store = store
        store.init_append(self.TABLE, ROLLUP_SCHEMA)

    @staticmethod
    def _partials(batch: DataFrame) -> DataFrame:
        return (batch
                .select(F.date_trunc("HOUR", "ts").alias("bucket_start"),
                        "event_type", "value")
                .groupBy("bucket_start", "event_type")
                .agg(F.count(F.lit(1)).alias("n"),
                     F.sum(F.round(F.col("value") * 100).cast("long"))
                     .alias("sum_value_c")))

    def maintain(self, batch: DataFrame) -> None:
        """Append the batch's partial aggregates (O(batch) work)."""
        self.store.append(self.TABLE, self._partials(batch))

    def query(self) -> DataFrame:
        """Merged rollup: one row per (bucket, type) with final
        measures."""
        return (self.store.read(self.TABLE)
                .groupBy("bucket_start", "event_type")
                .agg(F.sum("n").alias("n"),
                     (F.sum("sum_value_c").cast("double") / 100.0)
                     .alias("sum_value")))

    def compact(self) -> None:
        """Fold partials to one row per bucket (bounded read cost);
        results are unchanged — partials are algebraic."""
        merged = (self.store.read(self.TABLE)
                  .groupBy("bucket_start", "event_type")
                  .agg(F.sum("n").alias("n"),
                       F.sum("sum_value_c").alias("sum_value_c"))
                  .select("bucket_start", "event_type", "n",
                          "sum_value_c"))
        # materialize BEFORE truncating — Spark reads lazily, so writing
        # straight back would scan files the truncate just deleted
        import os
        import shutil
        tmp = self.store._path(self.TABLE) + "__compact"
        merged.write.mode("overwrite").parquet(tmp)
        self.store.truncate(self.TABLE, ROLLUP_SCHEMA)
        self.store.append(self.TABLE,
                          self.store.spark.read.parquet(tmp))
        shutil.rmtree(tmp, ignore_errors=True)
