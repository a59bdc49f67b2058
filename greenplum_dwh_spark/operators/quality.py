"""Data-quality profiling operator — the validation pass a
training-data pipeline runs before trusting an input table: row/key
cardinalities, null counts, domain ranges, referential orphans."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from greenplum_dwh_spark.sources.tpch import Tables


def dq_orders_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-row profile of the orders table: exact cardinalities,
    null counts, date domain, and lineitem referential orphan count."""
    t = Tables(spark, sf_dir)
    o = t.orders
    orphans = (t.lineitem.join(o.select("o_orderkey"),
                               t.lineitem.l_orderkey == o.o_orderkey,
                               "left_anti")
               .agg(F.count(F.lit(1)).alias("orphan_lineitems")))
    profile = o.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("o_orderkey").alias("n_keys"),
        F.sum(F.when(F.col("o_custkey").isNull(), 1).otherwise(0))
        .alias("null_custkeys"),
        F.min("o_orderdate").alias("min_orderdate"),
        F.max("o_orderdate").alias("max_orderdate"))
    return profile.crossJoin(orphans)


QUERIES = {"dq_orders_profile": dq_orders_profile}

ORACLES = {
    "dq_orders_profile": """
        SELECT
          (SELECT count(*) FROM orders) AS n_rows,
          (SELECT count(DISTINCT o_orderkey) FROM orders) AS n_keys,
          (SELECT sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)::BIGINT
           FROM orders) AS null_custkeys,
          (SELECT min(o_orderdate) FROM orders) AS min_orderdate,
          (SELECT max(o_orderdate) FROM orders) AS max_orderdate,
          (SELECT count(*) FROM lineitem
           WHERE NOT EXISTS (SELECT 1 FROM orders
                             WHERE o_orderkey = l_orderkey))
              AS orphan_lineitems""",
}
