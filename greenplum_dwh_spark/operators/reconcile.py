"""Snapshot reconciliation: classify the rows that differ between two
versions of a table (added / removed / changed) — the validation step
behind CDC pipelines, backfills, and engine migrations (exactly what a
user switching off the reference warehouse runs to prove parity).

Scale design: both sides reduce to (key, digest) BEFORE the join — the
digest is an md5 over the compared columns computed map-side, so the
full-outer shuffle moves two narrow columns instead of whole rows no
matter how wide the table is.  One shuffle join on the key; the change
classification is a pure projection over the join output.

The driver query plants a deterministic "new snapshot" of ``orders``
(drops every 101st key, reprices every 13th, appends every 17th under
a shifted key) and diffs it against the original — the same
plant-then-operate discipline as scrub_pii/remove_boilerplate_lines,
so all three change classes are exercised for real and the DuckDB
oracle replays the identical plant.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from greenplum_dwh_spark.sources.tpch import Tables

#: key shift for planted "added" rows (beyond any real o_orderkey)
ADD_SHIFT = 100_000_000


def table_diff(left: DataFrame, right: DataFrame, key: str,
               compare_cols: list[str]) -> DataFrame:
    """Rows differing between two snapshots, classified as ``added``
    (key only in ``right``), ``removed`` (key only in ``left``) or
    ``changed`` (key in both, any compared column differs).  Returns
    (key, change, left_digest, right_digest); unchanged rows are
    dropped before they ever reach the driver.  NULLs are digested
    via a sentinel so NULL ≠ '' and column boundaries can't alias
    (unit-separator join)."""
    def digest(df: DataFrame) -> Column:
        cols = [F.coalesce(F.col(c).cast("string"), F.lit("<NULL>"))
                for c in compare_cols]
        return F.md5(F.concat_ws("\x1f", *cols))

    li = left.select(F.col(key), digest(left).alias("l_digest"))
    ri = right.select(F.col(key), digest(right).alias("r_digest"))
    j = li.join(ri, key, "full_outer")
    change = (F.when(F.col("l_digest").isNull(), "added")
              .when(F.col("r_digest").isNull(), "removed")
              .when(F.col("l_digest") != F.col("r_digest"), "changed"))
    return (j.select(key, change.alias("change"),
                     "l_digest", "r_digest")
            .filter(F.col("change").isNotNull()))


#: compared columns are pre-normalized: the price is digested as exact
#: cents (round half-up, the repo-wide convention) because double →
#: string rendering is not engine-portable while BIGINT → string is
_DIFF_COLS = ["o_orderstatus", "cents", "o_orderpriority"]


def _normalized(orders: DataFrame) -> DataFrame:
    return orders.select(
        "o_orderkey", "o_orderstatus",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        "o_orderpriority")


def _planted_snapshot(orders: DataFrame) -> DataFrame:
    """Deterministic second snapshot: remove, reprice, append."""
    kept = (_normalized(orders)
            .filter(F.col("o_orderkey") % 101 != 0)
            .withColumn(
                "cents",
                F.when(F.col("o_orderkey") % 13 == 0,
                       F.col("cents") + 100)
                .otherwise(F.col("cents"))))
    added = (_normalized(orders)
             .filter(F.col("o_orderkey") % 17 == 0)
             .withColumn("o_orderkey",
                         F.col("o_orderkey") + ADD_SHIFT))
    return kept.unionByName(added)


def table_diff_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Tables(spark, sf_dir).orders
    return table_diff(_normalized(o), _planted_snapshot(o),
                      "o_orderkey", _DIFF_COLS)


QUERIES = {
    "table_diff_orders": table_diff_orders,
}

_DG = ("md5(coalesce(o_orderstatus::VARCHAR, '<NULL>') || chr(31) || "
       "coalesce(cents::VARCHAR, '<NULL>') || chr(31) || "
       "coalesce(o_orderpriority::VARCHAR, '<NULL>'))")

ORACLES = {
    "table_diff_orders": f"""
        WITH base AS (
          SELECT o_orderkey, o_orderstatus,
                 round(o_totalprice * 100)::BIGINT AS cents,
                 o_orderpriority
          FROM orders),
        snap AS (
          SELECT o_orderkey, o_orderstatus,
                 CASE WHEN o_orderkey % 13 = 0 THEN cents + 100
                      ELSE cents END AS cents,
                 o_orderpriority
          FROM base WHERE o_orderkey % 101 <> 0
          UNION ALL
          SELECT o_orderkey + {ADD_SHIFT}, o_orderstatus, cents,
                 o_orderpriority
          FROM base WHERE o_orderkey % 17 = 0),
        li AS (SELECT o_orderkey, {_DG} AS l_digest FROM base),
        ri AS (SELECT o_orderkey, {_DG} AS r_digest FROM snap),
        j AS (SELECT coalesce(li.o_orderkey, ri.o_orderkey)
                         AS o_orderkey,
                     li.l_digest, ri.r_digest
              FROM li FULL OUTER JOIN ri
                ON li.o_orderkey = ri.o_orderkey)
        SELECT o_orderkey,
               CASE WHEN l_digest IS NULL THEN 'added'
                    WHEN r_digest IS NULL THEN 'removed'
                    WHEN l_digest <> r_digest THEN 'changed'
               END AS change,
               l_digest, r_digest
        FROM j
        WHERE l_digest IS NULL OR r_digest IS NULL
           OR l_digest <> r_digest""",
}
