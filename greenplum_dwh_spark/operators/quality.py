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


def constraint_violations(df: DataFrame,
                          checks: list[tuple[str, "F.Column"]],
                          unique_key: str | None = None) -> DataFrame:
    """Single-pass data-quality gate: evaluate every row-level
    constraint in ONE scan (each check is a conditional-sum aggregate
    — adding a constraint adds an agg buffer, never a pass) and emit
    the long-form violation report (constraint, n_violations),
    including zero rows so a silently-skipped check is visible.

    ``checks`` are (name, violation_predicate) pairs; ``unique_key``
    additionally counts duplicate-key rows (rows beyond the first per
    key) via one groupBy — the only constraint that genuinely needs a
    shuffle.  This is the pre-trust gate a 100 TB ingest runs before
    a table is published; at that scale the one-pass property is the
    difference between one fact scan and |checks| of them."""
    # coalesce to 0: on an EMPTY batch sum() is NULL, and a gate
    # comparing n_violations == 0 would mis-classify the batch.
    # Names ride as struct-field LITERALS, never as parsed SQL
    # identifiers (round-3 ADVICE: the old stack(...) selectExpr let
    # a quote in a caller-supplied check name break parsing or inject
    # expression fragments) — positional aliases carry the buffers.
    aggs = [F.struct(
                F.lit(name).alias("constraint"),
                F.coalesce(F.sum(F.when(pred, 1).otherwise(0)),
                           F.lit(0)).cast("long").alias("n_violations"))
            .alias(f"_c{i}")
            for i, (name, pred) in enumerate(checks)]
    wide = df.agg(*aggs)
    long = (wide.select(F.explode(F.array(
                *[F.col(f"_c{i}") for i in range(len(checks))]))
                .alias("kv"))
            .select("kv.constraint", "kv.n_violations"))
    if unique_key is not None:
        dups = (df.groupBy(unique_key)
                .agg(F.count(F.lit(1)).alias("_n"))
                .agg(F.coalesce(
                    F.sum(F.when(F.col("_n") > 1, F.col("_n") - 1)),
                    F.lit(0)).cast("long").alias("n_violations"))
                .select(F.lit(f"unique_{unique_key}")
                        .alias("constraint"), "n_violations"))
        long = long.unionByName(dups)
    return long


#: planted violations for the driver demo use NEGATIVE keys
#: (-key - 1…3): collision-proof against any non-negative corpus key
#: space.  The previous +40M shift landed exactly on the derived
#: big-data corpora's replica-offset keys (900k-key overlap at sf1 —
#: the planted "one violation per class" became four unique-key
#: violations there; counts stayed oracle-consistent, the narrative
#: didn't)


def dq_constraint_violations(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """Plant one violation of each class into orders (a duplicated
    key, a NULL custkey, a negative price, an unknown status), then
    run the one-pass gate — every constraint must light up with an
    exact count the oracle reproduces."""
    o = Tables(spark, sf_dir).orders.select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
    # materialize the anchor row ONCE (driver-side 1-row read): the
    # four plant branches would otherwise each embed their own
    # TakeOrderedAndProject over a full orders scan
    r = o.orderBy("o_orderkey").limit(1).collect()[0]
    plants = spark.createDataFrame(
        [(r.o_orderkey, r.o_custkey, r.o_totalprice,
          r.o_orderstatus),                              # duplicate key
         (-r.o_orderkey - 1, None, r.o_totalprice,
          r.o_orderstatus),                              # null custkey
         (-r.o_orderkey - 2, r.o_custkey, -1.0,
          r.o_orderstatus),                              # negative price
         (-r.o_orderkey - 3, r.o_custkey,
          r.o_totalprice, "X")],                         # bad status
        o.schema)
    planted = o.unionByName(plants)
    return constraint_violations(
        planted,
        [("null_custkey", F.col("o_custkey").isNull()),
         ("negative_price", F.col("o_totalprice") < 0),
         ("bad_status",
          ~F.col("o_orderstatus").isin("O", "F", "P"))],
        unique_key="o_orderkey")


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
           "key_skew_profile": key_skew_profile,
           "dq_constraint_violations": dq_constraint_violations}

ORACLES = {
    "dq_constraint_violations": f"""
        WITH f AS (SELECT o_orderkey, o_custkey, o_totalprice,
                          o_orderstatus
                   FROM orders ORDER BY o_orderkey LIMIT 1),
        p AS (
          SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus
          FROM orders
          UNION ALL SELECT o_orderkey, o_custkey, o_totalprice,
                           o_orderstatus FROM f
          UNION ALL SELECT -o_orderkey - 1, NULL,
                           o_totalprice, o_orderstatus FROM f
          UNION ALL SELECT -o_orderkey - 2, o_custkey,
                           -1.0, o_orderstatus FROM f
          UNION ALL SELECT -o_orderkey - 3, o_custkey,
                           o_totalprice, 'X' FROM f),
        wide AS (SELECT
          sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)::BIGINT
              AS null_custkey,
          sum(CASE WHEN o_totalprice < 0 THEN 1 ELSE 0 END)::BIGINT
              AS negative_price,
          sum(CASE WHEN o_orderstatus NOT IN ('O', 'F', 'P')
                   THEN 1 ELSE 0 END)::BIGINT AS bad_status
          FROM p),
        dups AS (SELECT coalesce(sum(n - 1), 0)::BIGINT AS v
                 FROM (SELECT count(*) AS n FROM p
                       GROUP BY o_orderkey) WHERE n > 1)
        SELECT 'null_custkey' AS "constraint", null_custkey
            AS n_violations FROM wide
        UNION ALL SELECT 'negative_price', negative_price FROM wide
        UNION ALL SELECT 'bad_status', bad_status FROM wide
        UNION ALL SELECT 'unique_o_orderkey', v FROM dups""",
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
