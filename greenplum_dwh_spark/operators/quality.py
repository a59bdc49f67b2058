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


#: how many of the heaviest keys the skew profile reports
SKEW_TOP = 10


def key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-key skew diagnosis for the events fact: the top
    :data:`SKEW_TOP` heaviest ``user_id`` keys with exact integer
    share ingredients — the measurement you take BEFORE deciding to
    salt a join or aggregation (``functions/skew.py``), and the one a
    100 TB pipeline should emit continuously, because a key whose
    share of rows grows toward 1/parallelism is the single most common
    cause of a stuck stage.

    Emits (rank, user_id, n, n_keys, total_rows): the key's share is
    n/total_rows and the uniform baseline is total_rows/n_keys, both
    left as exact integers.  Plan: one map-side-combined groupBy on
    the key, then TakeOrderedAndProject(top) plus a broadcast 1-row
    corpus aggregate — no global sort, nothing driver-side."""
    t = Tables(spark, sf_dir)
    from pyspark.sql import Window
    per_key = (t.events.groupBy("user_id")
               .agg(F.count(F.lit(1)).alias("n")))
    totals = per_key.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("n").alias("total_rows"))
    w = Window.orderBy(F.desc("n"), F.asc("user_id"))
    return (per_key.orderBy(F.desc("n"), F.asc("user_id"))
            .limit(SKEW_TOP)
            .withColumn("rank", F.row_number().over(w).cast("int"))
            .crossJoin(F.broadcast(totals))
            .select("rank", "user_id", "n", "n_keys", "total_rows"))


QUERIES = {"dq_orders_profile": dq_orders_profile,
           "key_skew_profile": key_skew_profile}

ORACLES = {
    "key_skew_profile": f"""
        WITH per_key AS (SELECT user_id, count(*)::BIGINT AS n
                         FROM events GROUP BY user_id),
        totals AS (SELECT count(*)::BIGINT AS n_keys,
                          sum(n)::BIGINT AS total_rows FROM per_key),
        rk AS (SELECT user_id, n, row_number() OVER (
                   ORDER BY n DESC, user_id) AS rank FROM per_key)
        SELECT rank::INT AS rank, user_id, n, t.n_keys, t.total_rows
        FROM rk CROSS JOIN totals t
        WHERE rank <= {SKEW_TOP}""",
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
