"""Relational operator library — one driver-contract query per operator
family of SURVEY.md §2, expressed Spark-first over the TPC-H-ish
testdata tables.

Every query here has a DuckDB oracle in ``ORACLES``. Parity rules used
throughout (so the driver's order-insensitive value-hash matches
bit-for-bit):

- sums over ≤2-decimal doubles use scaled int64 arithmetic
  (``sum(round(x·100)) / 100.0`` — exact, order-independent, and ~2×
  faster than decimal sums) so both engines produce the identical
  double;
- averages/ratios are a single double division of exact ingredients;
- window orderings always include a unique tiebreak column;
- every computed column is aliased identically in both dialects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from greenplum_dwh_spark.functions.zorder import zorder_key2_sql
from greenplum_dwh_spark.sources.tpch import Tables


def _dsum(col):
    """Order-independent exact sum of a ≤2-decimal double column →
    double, via scaled-integer arithmetic: round(x·100) is an exact
    integer (the values are 2-decimal by construction, so the scaled
    double is integral up to ~1e-9 ulp noise and rounding is
    unambiguous in every engine), the int64 sum is exact, and the
    final /100.0 is one IEEE division. ~2× faster than decimal sums
    in Tungsten and still bit-identical to the DuckDB oracle."""
    return (F.sum(F.round(col * 100).cast("long")).cast("double") / 100.0)


def _dsum_mul(a, b):
    """Exact sum of a product of two ≤2-decimal factors: the product is
    4-decimal-valued, so scale by 10^4 and sum as int64 (exact,
    order-independent), then one division back."""
    return (F.sum(F.round(a * b * 10000).cast("long")).cast("double")
            / 10000.0)


# ---------------------------------------------------------------------------
# A1/F3 — grouped aggregation with derived measures (TPC-H Q1 shape).
# Reference analog: landing→dim GROUP BY attr tuple + min() (ETL.sql:20-27).
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    li = t.lineitem
    return (li.groupBy("l_returnflag", "l_linestatus")
            .agg(_dsum(F.col("l_quantity")).alias("sum_qty"),
                 _dsum(F.col("l_extendedprice")).alias("sum_base_price"),
                 _dsum_mul(F.col("l_extendedprice"), 1 - F.col("l_discount"))
                 .alias("sum_disc_price"),
                 F.count(F.lit(1)).alias("count_order"))
            .withColumn("avg_qty", F.col("sum_qty") / F.col("count_order")))


# J1 — multi-way join + group agg (TPC-H Q3 shape; the 5-way mart join
# Data_mart.sql:175-183 is the same plan family: small side broadcast).
def q3_segment_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return (t.lineitem
            .join(t.orders, t.lineitem.l_orderkey == t.orders.o_orderkey)
            .join(F.broadcast(t.customer),
                  t.orders.o_custkey == t.customer.c_custkey)
            .filter(F.col("c_mktsegment") == "BUILDING")
            .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
            .agg(_dsum_mul(F.col("l_extendedprice"), 1 - F.col("l_discount"))
                 .alias("revenue")))


# J1 — 6-way join through region→nation→(customer,supplier) (Q5 shape).
def q5_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return (t.lineitem
            .join(t.orders, t.lineitem.l_orderkey == t.orders.o_orderkey)
            .join(F.broadcast(t.supplier),
                  t.lineitem.l_suppkey == t.supplier.s_suppkey)
            .join(F.broadcast(t.customer),
                  (t.orders.o_custkey == t.customer.c_custkey)
                  & (t.customer.c_nationkey == t.supplier.s_nationkey))
            .join(F.broadcast(t.nation),
                  t.supplier.s_nationkey == t.nation.n_nationkey)
            .join(F.broadcast(t.region),
                  t.nation.n_regionkey == t.region.r_regionkey)
            .filter(F.col("r_name") == "ASIA")
            .groupBy("n_name")
            .agg(_dsum_mul(F.col("l_extendedprice"), 1 - F.col("l_discount"))
                 .alias("revenue")))


# TPC-H Q10 shape — returned-item revenue ranking: fact filter →
# 3 joins (customer shuffles with orders on custkey; nation
# broadcast) → per-customer revenue → top 20.  The top-k plans as
# TakeOrderedAndProject, so the global ranking never needs a
# single-partition sort of the full aggregate.
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    top = (t.lineitem
           .filter(F.col("l_returnflag") == "R")
           .join(t.orders, t.lineitem.l_orderkey == t.orders.o_orderkey)
           .join(t.customer,
                 t.orders.o_custkey == t.customer.c_custkey)
           .join(F.broadcast(t.nation),
                 t.customer.c_nationkey == t.nation.n_nationkey)
           .groupBy("c_custkey", "c_name", "n_name")
           .agg(_dsum_mul(F.col("l_extendedprice"),
                          1 - F.col("l_discount")).alias("revenue"))
           .orderBy(F.desc("revenue"), F.asc("c_custkey"))
           .limit(20))
    w = Window.orderBy(F.desc("revenue"), F.asc("c_custkey"))
    return (top.withColumn("rank", F.row_number().over(w).cast("int"))
            .select("rank", "c_custkey", "c_name", "n_name", "revenue"))


# TPC-H Q18 shape — large-quantity orders: the aggregate-then-semi-
# join pattern (find keys whose SUM crosses a threshold, then join
# the qualifying keys back for detail).  The qualifying-key set is
# tiny by construction (the threshold is the point), so it
# broadcasts; quantities sum as exact scaled ints.
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    big = (t.lineitem.groupBy("l_orderkey")
           .agg(F.sum(F.round(F.col("l_quantity") * 100).cast("long"))
                .alias("qty_cents"))
           .filter(F.col("qty_cents") > 300 * 100))
    return (t.orders
            .join(F.broadcast(big),
                  t.orders.o_orderkey == big.l_orderkey)
            .join(F.broadcast(t.customer),
                  t.orders.o_custkey == t.customer.c_custkey)
            .select("c_custkey", "c_name", "o_orderkey", "o_orderdate",
                    (F.col("qty_cents").cast("double") / 100.0)
                    .alias("total_qty")))


# Z-order layout keys (functions/zorder.py): the Morton interleave of
# (custkey, order-day) that a 2-D clustered compaction sorts by.  The
# derivation is a pure map-side integer expression — this query
# hash-checks it bit-for-bit; the layout property itself (bounded
# per-file bounding boxes → 2-D row-group skipping) is pinned by
# tests/test_bucketing.py::test_zorder_clustering_bounds_file_boxes.
def zorder_keys_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from greenplum_dwh_spark.functions.zorder import zorder_key2
    t = Tables(spark, sf_dir)
    day = F.datediff(F.col("o_orderdate"), F.lit("1992-01-01"))
    return t.orders.select(
        "o_orderkey",
        (F.col("o_custkey") % (1 << 16)).alias("ck_norm"),
        F.pmod(day, F.lit(1 << 16)).alias("day_norm"),
        zorder_key2(F.col("o_custkey") % (1 << 16),
                    F.pmod(day, F.lit(1 << 16))).alias("zkey"))


# A4/S12 — pivoted counts (plot_report.py:16 analog), explicit when-sums
# so column names are stable across engines.
def pivot_status_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    cnt = lambda s: F.sum(F.when(F.col("o_orderstatus") == s, 1)
                          .otherwise(0)).alias(f"n_{s.lower()}")
    return (t.orders.groupBy("o_orderpriority")
            .agg(cnt("O"), cnt("F"), cnt("P")))


# W1 — lead() per key (SCD2 staging, ETL.sql:19).
def window_lead_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return t.orders.select(
        "o_orderkey", "o_custkey", "o_orderdate",
        F.lead("o_orderdate").over(w).alias("next_order_dt"))


# W2/P6 — lag() city-hop shape on the events stream (Data_mart.sql:289-293).
def window_lag_hop(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (t.events.select(
                "event_id", "user_id", "event_type", "ts",
                F.lag("event_type").over(w).alias("prev_type"),
                (F.unix_timestamp("ts")
                 - F.unix_timestamp(F.lag("ts").over(w))).alias("gap_sec"))
            .filter((F.col("event_type") != F.col("prev_type"))
                    & (F.col("gap_sec") < 3600))
            .select("event_id", "user_id", "event_type", "prev_type",
                    "gap_sec"))


# W3/W4/A3 — last_value + min/max over key + update_dt CASE
# (SCD1 staging, ETL.sql:250-260).
def window_last_scd1(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    w_last = (Window.partitionBy("o_custkey")
              .orderBy("o_orderdate", "o_orderkey")
              .rowsBetween(Window.unboundedPreceding,
                           Window.unboundedFollowing))
    w_key = Window.partitionBy("o_custkey")
    mx, mn = (F.max("o_orderdate").over(w_key),
              F.min("o_orderdate").over(w_key))
    return (t.orders.select(
        "o_custkey",
        F.last("o_orderstatus").over(w_last).alias("last_status"),
        mn.alias("create_dt"),
        F.when(mx == mn, F.lit(None).cast("timestamp"))
         .otherwise(mx).alias("update_dt"))
        .distinct())


# W5 frame variants beyond the unbounded/running frames: a bounded
# sliding ROWS frame (trailing-3 moving sum) ...
def moving_sum_rows_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(-3, Window.currentRow))
    cents = F.round(F.col("value") * 100).cast("long")
    return t.events.select(
        "event_id", "user_id",
        (F.sum(cents).over(w).cast("double") / 100.0)
        .alias("trailing_sum"),
        F.count(F.lit(1)).over(w).cast("int").alias("n_in_frame"))


# ... and a time-RANGE frame (sum over the trailing hour of event
# time, on integer epoch seconds so both engines frame identically).
def range_frame_hour_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    sec = F.unix_timestamp("ts")
    w = (Window.partitionBy("user_id").orderBy("sec")
         .rangeBetween(-3600, 0))
    cents = F.round(F.col("value") * 100).cast("long")
    return (t.events
            .select("event_id", "user_id", sec.alias("sec"),
                    cents.alias("cents"))
            .select("event_id", "user_id",
                    (F.sum("cents").over(w).cast("double") / 100.0)
                    .alias("hour_sum"),
                    F.count(F.lit(1)).over(w).cast("int")
                    .alias("n_in_hour")))


# J2/J3 — anti join (NOT EXISTS, ETL.sql:92-99).
def anti_join_no_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return (t.customer.join(t.orders,
                            t.customer.c_custkey == t.orders.o_custkey,
                            "left_anti")
            .select("c_custkey", "c_name"))


# semi join (EXISTS) — companion of J2 in the operator library.
def semi_join_big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    big = t.orders.filter(F.col("o_totalprice") > 300000.0)
    return (t.customer.join(big, t.customer.c_custkey == big.o_custkey,
                            "left_semi")
            .select("c_custkey", "c_mktsegment"))


# U1/F3 — UNION ALL of labeled rule outputs (Data_mart.sql:260-293 shape).
def union_labeled_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    o = t.orders
    a = (o.filter(F.col("o_totalprice") > 400000.0)
         .select("o_orderkey", F.lit("high_value").alias("rule")))
    b = (o.filter(F.col("o_orderpriority") == "1-URGENT")
         .select("o_orderkey", F.lit("urgent").alias("rule")))
    return a.unionByName(b)


# scalar string-function family (F1/F11 and beyond): case mapping,
# trim/pad, substring, replace, translate — identical across engines.
def string_funcs_demo(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return t.customer.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.lower("c_mktsegment").alias("seg_lower"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.length(F.trim(F.col("c_name"))).alias("name_len"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0")
        .alias("key_padded"),
        F.regexp_replace("c_name", "[0-9]", "#").alias("name_masked"),
        F.translate("c_mktsegment", "AEIOU", "aeiou")
        .alias("seg_translated"))


# null-introduction + handling: nullif / coalesce / CASE over nulls.
def null_handling_demo(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    status_or_null = F.expr("nullif(o_orderstatus, 'O')")
    return (t.orders.select(
        "o_orderkey",
        status_or_null.alias("closed_status"),
        F.coalesce(status_or_null, F.lit("OPEN")).alias("status_filled"),
        F.when(status_or_null.isNull(), 1).otherwise(0)
        .cast("int").alias("is_open"))
    )


# range (theta) join: events against generated hour buckets — the join
# family the equi-join operators don't cover. The bucket side is tiny
# and broadcast, so the plan is a broadcast nested-loop with a range
# predicate — the standard shape for interval/temporal joins.
def range_join_hour_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    ev = t.events
    bounds = ev.agg(
        F.date_trunc("HOUR", F.min("ts")).alias("lo"),
        F.date_trunc("HOUR", F.max("ts")).alias("hi"))
    buckets = (bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR")))
        .alias("bucket_start")))
    joined = ev.join(
        F.broadcast(buckets),
        (F.col("ts") >= F.col("bucket_start"))
        & (F.col("ts") < F.col("bucket_start")
           + F.expr("INTERVAL 1 HOUR")))
    return (joined.groupBy("bucket_start")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.countDistinct("user_id").alias("n_users")))


# scale-safe rewrite of range_join_hour_buckets: because the buckets
# are ALIGNED (hour-truncated sequence), the range predicate collapses
# to an equi key — bucket_start == date_trunc('HOUR', ts). The plan
# becomes one hash aggregate on the hour key plus a broadcast equi-join
# against the generated bucket dimension, instead of a broadcast
# nested-loop evaluating every event against every bucket (which grows
# with the covered time span: years of data ⇒ ~10⁴ buckets per event).
# Aggregate-before-join keeps the join input at one row per non-empty
# hour. Oracle-checked to the identical result as the theta form; keep
# range_join_hour_buckets as the general (unaligned-interval) demo.
def range_join_tumbling_rewrite(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    ev = t.events
    binned = (ev.select(F.date_trunc("HOUR", "ts").alias("bucket_start"),
                        "user_id")
              .groupBy("bucket_start")
              .agg(F.count(F.lit(1)).alias("n"),
                   F.countDistinct("user_id").alias("n_users")))
    bounds = ev.agg(
        F.date_trunc("HOUR", F.min("ts")).alias("lo"),
        F.date_trunc("HOUR", F.max("ts")).alias("hi"))
    buckets = (bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR")))
        .alias("bucket_start")))
    return (binned.join(F.broadcast(buckets), "bucket_start")
            .select("bucket_start", "n", "n_users"))


# null-aware anti join: NOT IN (subquery) plans as a distinct Spark
# operator (BroadcastNestedLoopJoin/NullAwareAntiJoin family).
def not_in_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    t.orders.createOrReplaceTempView("_o")
    t.customer.createOrReplaceTempView("_c")
    return spark.sql("""
        SELECT o_orderkey, o_custkey FROM _o
        WHERE o_custkey NOT IN (SELECT c_custkey FROM _c
                                WHERE c_mktsegment = 'AUTOMOBILE')""")


# correlated scalar subquery — Catalyst decorrelates to a join; issued
# through the engine's SQL surface to exercise that entry path too.
def scalar_subquery_acctbal(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    t.orders.createOrReplaceTempView("_o2")
    t.customer.createOrReplaceTempView("_c2")
    return spark.sql("""
        SELECT o_orderkey,
               (SELECT c_acctbal FROM _c2 WHERE c_custkey = o_custkey)
                   AS acctbal
        FROM _o2""")


# calendar extraction (engine-specific dow conventions normalized:
# both sides compute ISO day-of-week 1=Monday..7=Sunday).
def orders_calendar(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return (t.orders
            .select(F.year("o_orderdate").alias("y"),
                    F.month("o_orderdate").alias("m"),
                    F.dayofweek("o_orderdate").alias("_dow"))
            .withColumn("isodow",
                        F.when(F.col("_dow") == 1, 7)
                        .otherwise(F.col("_dow") - 1).cast("int"))
            .groupBy("y", "m", "isodow")
            .agg(F.count(F.lit(1)).alias("n")))


# funnel analysis: users progressing signup → later click → later
# purchase (strict event-time ordering via staged minimum timestamps).
def funnel_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    ev = t.events
    s1 = (ev.filter(F.col("event_type") == "signup")
          .groupBy("user_id").agg(F.min("ts").alias("t_signup")))
    s2 = (ev.filter(F.col("event_type") == "click")
          .join(s1, "user_id")
          .filter(F.col("ts") > F.col("t_signup"))
          .groupBy("user_id", "t_signup")
          .agg(F.min("ts").alias("t_click")))
    s3 = (ev.filter(F.col("event_type") == "purchase")
          .join(s2, "user_id")
          .filter(F.col("ts") > F.col("t_click"))
          .groupBy("user_id", "t_signup", "t_click")
          .agg(F.min("ts").alias("t_purchase")))
    return s3.select("user_id", "t_signup", "t_click", "t_purchase")


# ordered-set aggregates: exact interpolated percentiles (both engines
# use the same a + (b-a)·frac interpolation, so parity is bit-exact).
def percentile_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return (t.lineitem.groupBy("l_returnflag")
            .agg(F.expr("percentile(l_quantity, 0.5)").alias("median_qty"),
                 F.expr("percentile(l_extendedprice, 0.25)")
                 .alias("p25_price"),
                 F.expr("percentile(l_extendedprice, 0.75)")
                 .alias("p75_price")))


# set ops beyond UNION ALL: INTERSECT / EXCEPT (distinct semantics in
# both engines).
def set_intersect_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    o = t.orders
    a = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    b = (o.filter(F.col("o_orderpriority") == "1-URGENT")
         .select("o_custkey"))
    return a.intersect(b).select(F.col("o_custkey").alias("custkey"))


def set_except_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    o = t.orders
    a = o.select("o_custkey")
    b = (o.filter(F.col("o_orderpriority") == "1-URGENT")
         .select("o_custkey"))
    # subtract == SQL EXCEPT (distinct) semantics
    return a.subtract(b).select(F.col("o_custkey").alias("custkey"))


# P3/F4/A2 — scalar-subquery threshold with the day-truncation idiom
# (Data_mart.sql:138-139: >= day_start(max) − interval).
def last_week_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    li = t.lineitem
    mx = li.agg((F.date_trunc("DAY", F.max("l_shipdate"))
                 - F.expr("INTERVAL 7 DAYS")).alias("_thr"))
    return (li.join(F.broadcast(mx),
                    F.col("l_shipdate") >= F.col("_thr"), "inner")
            .groupBy("l_returnflag")
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 _dsum(F.col("l_extendedprice")).alias("sum_price")))


# F2/F10/W2 — coalesce'd lag difference (amount_diff, Data_mart.sql:30).
def amount_diff_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return t.events.select(
        "event_id", "user_id",
        F.coalesce(F.col("value") - F.lag("value").over(w),
                   F.lit(-1.0)).alias("amount_diff"))


# beyond-reference: ROLLUP grouping sets with GROUPING() flags.
def rollup_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return (t.orders.rollup("o_orderstatus", "o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.grouping("o_orderstatus").cast("int").alias("g_status"),
                 F.grouping("o_orderpriority").cast("int").alias("g_prio"))
            .select(F.coalesce("o_orderstatus", F.lit("ALL"))
                    .alias("status"),
                    F.coalesce("o_orderpriority", F.lit("ALL"))
                    .alias("priority"),
                    "n", "g_status", "g_prio"))


# beyond-reference: CUBE grouping sets (all 4 grouping combinations).
def cube_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return (t.orders.cube("o_orderstatus", "o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.grouping("o_orderstatus").cast("int").alias("g_status"),
                 F.grouping("o_orderpriority").cast("int").alias("g_prio"))
            .select(F.coalesce("o_orderstatus", F.lit("ALL"))
                    .alias("status"),
                    F.coalesce("o_orderpriority", F.lit("ALL"))
                    .alias("priority"),
                    "n", "g_status", "g_prio"))


# exact COUNT(DISTINCT) — two-level shuffle aggregate.
def distinct_parts_per_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return (t.lineitem.groupBy("l_returnflag")
            .agg(F.countDistinct("l_partkey").alias("n_parts"),
                 F.count(F.lit(1)).alias("n_rows")))


# approximate percentile sketch (t-digest-style) — rows-only like the
# HLL aggregate; tests bound its error vs the exact interpolated
# percentile.
def approx_percentile_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return (t.lineitem.groupBy("l_returnflag")
            .agg(F.expr("approx_percentile(l_extendedprice, 0.5, 1000)")
                 .alias("median_price_approx")))


# approximate COUNT(DISTINCT) (HyperLogLog++) — the sketch-aggregate
# scale path; estimates are engine-specific so this is rows-only, and
# tests assert the estimate's relative error against the exact count.
def approx_distinct_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return (t.lineitem.groupBy("l_returnflag")
            .agg(F.approx_count_distinct("l_partkey", rsd=0.02)
                 .alias("n_parts_approx")))


# P4/F8 — interval arithmetic + date comparison (late shipments).
def late_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    j = (t.lineitem.join(t.orders,
                         t.lineitem.l_orderkey == t.orders.o_orderkey)
         .filter(F.col("l_shipdate")
                 > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")))
    return j.select(
        "l_orderkey", "l_linenumber",
        F.floor((F.unix_timestamp("l_shipdate")
                 - F.unix_timestamp("o_orderdate")) / 86400)
        .cast("long").alias("days_late"))


# beyond-reference: JSON field extraction from the events props column.
def json_props_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    k = F.get_json_object("props", "$.k").cast("long")
    return (t.events.select("event_type", k.alias("k"))
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum("k").alias("sum_k")))


# §2.9 streaming-shaped: tumbling 1-hour event-time windows.
def tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return (t.events
            .select(F.date_trunc("HOUR", "ts").alias("hour_start"),
                    "event_type", "value")
            .groupBy("hour_start", "event_type")
            .agg(F.count(F.lit(1)).alias("n"),
                 _dsum(F.col("value")).alias("sum_value")))


#: staleness tolerance for the multi-key as-of join (hours): a quote
#: older than this is reported NULL, not stale-matched — sized to the
#: events corpus' per-(user, channel) cadence (~40 h) so both the
#: matched and the tolerance-nulled branches carry rows at sf0.01
ASOF_TOLERANCE_HOURS = 48


# multi-key as-of join WITH tolerance (round 8): for every purchase,
# the latest preceding 'view' on the SAME (user_id, channel) composite
# key — channel derived from the props JSON — NULLed when the match is
# staler than ASOF_TOLERANCE_HOURS.  The (symbol, venue)-style shape
# every tick store calls ASOF JOIN, here with a composite equality key
# and a staleness bound.
#
# Plan (the 100 TB story): NOT a range join — both streams union-tag
# into ONE relation and a single window over the composite key carries
# the last quote forward (last(when(tag=quote, ...), ignorenulls) over
# rows preceding), so the only exchange is one hash partition on
# (user_id, chan); quotes are pre-deduplicated to one row per
# (key, ts) — greatest event_id wins — so the carry-forward tie-break
# is deterministic and matches DuckDB's native ASOF JOIN, which is the
# oracle (equal timestamps match: the quote sorts before the trade at
# the same ts via the tag).
def asof_join_multikey(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    k = F.get_json_object("props", "$.k").cast("long")
    ev = t.events.select(
        "event_id", "user_id", "ts", "event_type", "value",
        F.pmod(k, F.lit(4)).alias("chan"))
    wq = (Window.partitionBy("user_id", "chan", "ts")
          .orderBy(F.desc("event_id")))
    quotes = (ev.filter(F.col("event_type") == "view")
              .withColumn("rq", F.row_number().over(wq))
              .filter(F.col("rq") == 1)
              .select("event_id", "user_id", "chan", "ts", "value",
                      F.lit(0).alias("tag")))
    trades = (ev.filter(F.col("event_type") == "purchase")
              .select("event_id", "user_id", "chan", "ts", "value",
                      F.lit(1).alias("tag")))
    w = (Window.partitionBy("user_id", "chan")
         .orderBy("ts", "tag", "event_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    q_ts = F.last(F.when(F.col("tag") == 0, F.col("ts")),
                  ignorenulls=True).over(w)
    q_val = F.last(F.when(F.col("tag") == 0, F.col("value")),
                   ignorenulls=True).over(w)
    fresh = F.col("q_ts") >= F.col("ts") - F.expr(
        f"INTERVAL {ASOF_TOLERANCE_HOURS} HOURS")
    return (quotes.unionByName(trades)
            .select("event_id", "user_id", "chan", "ts", "tag",
                    q_ts.alias("q_ts"), q_val.alias("q_val"))
            .filter(F.col("tag") == 1)
            .select("event_id", "user_id", "chan", "ts",
                    F.when(fresh, F.col("q_ts")).alias("quote_ts"),
                    F.when(fresh, F.col("q_val")).alias("quote_value")))


# as-of join: latest prior 'click' per event, same user (monotonic-max
# formulation keeps it portable and shuffle-minimal: one window pass).
def asof_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    last_click = F.max(F.when(F.col("event_type") == "click",
                              F.col("ts"))).over(w)
    return (t.events
            .select("event_id", "user_id", "ts", "event_type",
                    last_click.alias("last_click_ts"))
            .filter(F.col("event_type") == "purchase")
            .select("event_id", "user_id", "ts", "last_click_ts"))


# rule-4 fixed-lookback chain shape, SQL-expressible variant: a purchase
# preceded by 2 strictly-decreasing 'error' events within 24 h (the
# general ≥N state machine lives in mart/chains.py; this is the
# window-algebra member of the family, provable against the oracle —
# parameters sized to the events corpus's ~10 h per-user cadence).
def chain_fraud_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lag_t = lambda n: F.lag("event_type", n).over(w)
    lag_v = lambda n: F.lag("value", n).over(w)
    lag_ts = lambda n: F.lag("ts", n).over(w)
    return (t.events
            .withColumn("ok",
                        (F.col("event_type") == "purchase")
                        & (lag_t(1) == "error") & (lag_t(2) == "error")
                        & (lag_v(2) > lag_v(1))
                        & ((F.unix_timestamp("ts")
                            - F.unix_timestamp(lag_ts(2))) < 86400))
            .filter(F.col("ok"))
            .select("event_id", "user_id", "ts"))


# ranking-function family over one window: integer ranks plus the
# ratio forms (percent_rank = (rank−1)/(n−1), cume_dist = peers/n) —
# both single divisions of exact integers, so bit-identical across
# engines.
def window_rank_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey"))
    return t.orders.select(
        "o_orderkey", "o_orderpriority",
        F.row_number().over(w).alias("rn"),
        F.dense_rank().over(w).alias("drank"),
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("prank"),
        F.cume_dist().over(w).alias("cdist"))


# skew-mitigation surface as a checked query: the two-phase salted
# aggregation is a pure plan rewrite (partial agg on (key, salt) then
# final merge on key), so its result equals the plain GROUP BY the
# oracle runs — the hot-key 100 TB path gets a hash-green row, not
# just a unit test.
def skew_salted_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    from greenplum_dwh_spark.functions.skew import salted_count_sum
    t = Tables(spark, sf_dir)
    return salted_count_sum(t.events, "user_id", "value")


# continuous-aggregate algebra as a checked query: three disjoint
# "batches" produce per-batch partial aggregates (what HourlyRollup
# appends), the merge groupBy finishes them — result must equal the
# direct hourly GROUP BY the oracle runs.  Exactness holds because the
# partials are scaled-int sums (merge order never matters).
def rollup_merge_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    from greenplum_dwh_spark.operators.rollup_store import HourlyRollup
    ev = Tables(spark, sf_dir).events
    parts = None
    for i in range(3):
        p = HourlyRollup._partials(
            ev.filter(F.pmod(F.col("event_id"), F.lit(3)) == i))
        parts = p if parts is None else parts.unionByName(p)
    return (parts.groupBy("bucket_start", "event_type")
            .agg(F.sum("n").alias("n"),
                 (F.sum("sum_value_c").cast("double") / 100.0)
                 .alias("total")))


# GROUPING SETS — the third grouping-extension shape beside rollup and
# cube: explicitly enumerated grouping keys (priority-only, status-only,
# grand total).  Expressed through the SQL surface — Spark plans all
# three as one Expand + single hash aggregate, so the fact table is
# scanned once no matter how many sets are named (the 100 TB win over
# running the groupings separately).
def grouping_sets_priority_status(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    t.orders.createOrReplaceTempView("gs_orders")
    return spark.sql("""
        SELECT o_orderpriority, o_orderstatus,
               count(*) AS n,
               CAST(grouping(o_orderpriority) AS INT) AS g_priority,
               CAST(grouping(o_orderstatus) AS INT) AS g_status
        FROM gs_orders
        GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())""")


# UNPIVOT (wide→long) — the inverse of the pivot sink: melt the
# per-status count columns back to (priority, status, n) rows with
# ``stack``.  Generator-expression fan-out, no shuffle beyond the
# pivot's own aggregate; zero-count cells survive as explicit rows
# (unlike re-grouping, which would drop them).
def unpivot_status_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    wide = pivot_status_counts(spark, sf_dir)
    return wide.select(
        "o_orderpriority",
        F.expr("stack(3, 'O', n_o, 'F', n_f, 'P', n_p) AS (status, n)"))


# HAVING — filter on the aggregate's output (TPC-H Q18 shape): big
# spenders by exact summed cents.  Catalyst plans the HAVING as a
# post-aggregate filter in the same stage, so it costs nothing beyond
# the groupBy it already needed.
def big_spenders_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return (t.orders
            .groupBy("o_custkey")
            .agg(F.count(F.lit(1)).alias("n_orders"),
                 _dsum(F.col("o_totalprice")).alias("total_spend"))
            .filter(F.col("total_spend") > 1_500_000))


# argmax per group via max_by — one aggregate, no window, no self-join
# (the classic "row of the max" idiom at its cheapest: single shuffle,
# partial max_by on the map side).  The struct comparator makes the
# tie-break (higher orderkey) explicit and portable; the oracle proves
# the same semantics through a row_number formulation.
def argmax_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return (t.orders
            .groupBy("o_custkey")
            .agg(F.expr("max_by(o_orderkey, struct(o_totalprice, o_orderkey))")
                 .alias("top_orderkey"),
                 F.max("o_totalprice").alias("top_totalprice")))


# ordered list aggregation — collect per-customer order keys as a
# deterministic CSV (array_sort makes the result order-independent,
# array_join makes it engine-portable; raw array hashing differs by
# client representation).
def order_keys_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return (t.orders
            .groupBy("o_custkey")
            .agg(F.array_join(
                F.array_sort(F.collect_list("o_orderkey")), ",")
                .alias("orderkeys_csv")))


# FULL OUTER join — the one join type the mart pipeline never needed
# but a reconciliation query does: align per-user hourly click vs
# purchase activity, keeping hours where either side is missing.  Both
# sides pre-aggregate to (user, hour) grain before the join, so the
# exchange moves group-count rows, not raw events.
def full_outer_user_hours(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    hour = F.date_trunc("hour", "ts").alias("hour")
    side = lambda typ, out: (t.events.filter(F.col("event_type") == typ)
                             .select("user_id", hour)
                             .groupBy("user_id", "hour")
                             .agg(F.count(F.lit(1)).alias(out)))
    clicks = side("click", "n_clicks")
    purchases = side("purchase", "n_purchases")
    return (clicks.join(purchases, ["user_id", "hour"], "full")
            .select("user_id", "hour",
                    F.coalesce("n_clicks", F.lit(0)).alias("n_clicks"),
                    F.coalesce("n_purchases", F.lit(0))
                    .alias("n_purchases")))


# nth_value / first_value over an explicit full frame — the remaining
# window-function family members (W5 frame coverage: full-partition
# ROWS frame beside the running and sliding frames already checked).
def window_nth_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    w = (Window.partitionBy("o_orderpriority")
         .orderBy("o_orderdate", "o_orderkey")
         .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
    return t.orders.select(
        "o_orderkey", "o_orderpriority",
        F.first("o_orderkey").over(w).alias("first_key"),
        F.nth_value("o_orderkey", 3).over(w).alias("third_key"),
        F.last("o_orderkey").over(w).alias("last_key"))


QUERIES = {
    "q1_pricing_summary": q1_pricing_summary,
    "q3_segment_revenue": q3_segment_revenue,
    "q5_nation_revenue": q5_nation_revenue,
    "q10_returned_items": q10_returned_items,
    "zorder_keys_orders": zorder_keys_orders,
    "q18_large_orders": q18_large_orders,
    "pivot_status_counts": pivot_status_counts,
    "window_lead_scd2": window_lead_scd2,
    "window_lag_hop": window_lag_hop,
    "window_last_scd1": window_last_scd1,
    "moving_sum_rows_frame": moving_sum_rows_frame,
    "range_frame_hour_sum": range_frame_hour_sum,
    "anti_join_no_orders": anti_join_no_orders,
    "semi_join_big_orders": semi_join_big_orders,
    "union_labeled_rules": union_labeled_rules,
    "percentile_prices": percentile_prices,
    "funnel_users": funnel_users,
    "string_funcs_demo": string_funcs_demo,
    "null_handling_demo": null_handling_demo,
    # round-10 ledger consolidation (round-9 verdict item 4, the
    # bpe_pair_counts precedent): ``range_join_hour_buckets`` — the
    # general BNLJ theta demo — is retired as a DRIVER query; the
    # aligned rewrite below answers the identical question and the
    # theta kernel stays pinned by
    # test_plans.test_range_join_rewrite_is_equi_not_bnlj (exact
    # result equivalence both directions).  Its slot funds
    # dedup_image_phash (multimodal_ops).
    "range_join_tumbling_rewrite": range_join_tumbling_rewrite,
    "not_in_customers": not_in_customers,
    "scalar_subquery_acctbal": scalar_subquery_acctbal,
    "orders_calendar": orders_calendar,
    "set_intersect_customers": set_intersect_customers,
    "set_except_customers": set_except_customers,
    "last_week_threshold": last_week_threshold,
    "amount_diff_lag": amount_diff_lag,
    "rollup_status_priority": rollup_status_priority,
    "cube_status_priority": cube_status_priority,
    "distinct_parts_per_flag": distinct_parts_per_flag,
    "approx_distinct_parts": approx_distinct_parts,   # rows-only (HLL)
    "approx_percentile_prices": approx_percentile_prices,  # rows-only
    "late_shipments": late_shipments,
    "json_props_agg": json_props_agg,
    "tumbling_hourly": tumbling_hourly,
    "asof_last_click": asof_last_click,
    "asof_join_multikey": asof_join_multikey,
    "chain_fraud_window": chain_fraud_window,
    "skew_salted_user_totals": skew_salted_user_totals,
    "rollup_merge_hourly": rollup_merge_hourly,
    "window_rank_family": window_rank_family,
    "grouping_sets_priority_status": grouping_sets_priority_status,
    "unpivot_status_counts": unpivot_status_counts,
    "big_spenders_having": big_spenders_having,
    "argmax_order_per_customer": argmax_order_per_customer,
    "order_keys_csv": order_keys_csv,
    "full_outer_user_hours": full_outer_user_hours,
    "window_nth_family": window_nth_family,
}

_DSUM = "(cast(sum(round(({0}) * 100)::BIGINT) as double) / 100.0)"
_DSUM_MUL = ("(cast(sum(round(({0}) * ({1}) * 10000)::BIGINT) as double)"
             " / 10000.0)")

ORACLES = {
    "q1_pricing_summary": f"""
        SELECT l_returnflag, l_linestatus,
               {_DSUM.format('l_quantity')} AS sum_qty,
               {_DSUM.format('l_extendedprice')} AS sum_base_price,
               {_DSUM_MUL.format('l_extendedprice', '1 - l_discount')}
                   AS sum_disc_price,
               count(*) AS count_order,
               {_DSUM.format('l_quantity')} / count(*) AS avg_qty
        FROM lineitem GROUP BY l_returnflag, l_linestatus""",
    "q3_segment_revenue": f"""
        SELECT l_orderkey, o_orderdate, o_orderpriority,
               {_DSUM_MUL.format('l_extendedprice', '1 - l_discount')}
                   AS revenue
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority""",
    "q5_nation_revenue": f"""
        SELECT n_name,
               {_DSUM_MUL.format('l_extendedprice', '1 - l_discount')}
                   AS revenue
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             JOIN supplier ON l_suppkey = s_suppkey
             JOIN customer ON o_custkey = c_custkey
                          AND c_nationkey = s_nationkey
             JOIN nation ON s_nationkey = n_nationkey
             JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA' GROUP BY n_name""",
    "q18_large_orders": """
        WITH big AS (
          SELECT l_orderkey,
                 sum(round(l_quantity * 100)::BIGINT) AS qty_cents
          FROM lineitem GROUP BY l_orderkey
          HAVING sum(round(l_quantity * 100)::BIGINT) > 30000)
        SELECT c_custkey, c_name, o_orderkey, o_orderdate,
               (qty_cents::DOUBLE / 100.0) AS total_qty
        FROM orders JOIN big ON o_orderkey = big.l_orderkey
             JOIN customer ON o_custkey = c_custkey""",
    "zorder_keys_orders": f"""
        WITH n AS (
          SELECT o_orderkey,
                 (o_custkey % 65536)::BIGINT AS ck_norm,
                 (date_diff('day', DATE '1992-01-01',
                            o_orderdate::DATE) % 65536)::BIGINT
                     AS day_norm
          FROM orders)
        SELECT o_orderkey, ck_norm, day_norm,
               {zorder_key2_sql('ck_norm', 'day_norm')} AS zkey
        FROM n""",
    "q10_returned_items": f"""
        WITH agg AS (
          SELECT c_custkey, c_name, n_name,
                 {_DSUM_MUL.format('l_extendedprice', '1 - l_discount')}
                     AS revenue
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
               JOIN customer ON o_custkey = c_custkey
               JOIN nation ON c_nationkey = n_nationkey
          WHERE l_returnflag = 'R'
          GROUP BY c_custkey, c_name, n_name),
        rk AS (SELECT *, row_number() OVER (
                   ORDER BY revenue DESC, c_custkey) AS rank FROM agg)
        SELECT rank::INT AS rank, c_custkey, c_name, n_name, revenue
        FROM rk WHERE rank <= 20""",
    "pivot_status_counts": """
        SELECT o_orderpriority,
               sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END)::BIGINT AS n_o,
               sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)::BIGINT AS n_f,
               sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END)::BIGINT AS n_p
        FROM orders GROUP BY o_orderpriority""",
    "window_lead_scd2": """
        SELECT o_orderkey, o_custkey, o_orderdate,
               lead(o_orderdate) OVER (PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey) AS next_order_dt
        FROM orders""",
    "window_lag_hop": """
        WITH x AS (
          SELECT event_id, user_id, event_type,
                 lag(event_type) OVER w AS prev_type,
                 floor(epoch(ts))::BIGINT - floor(epoch(lag(ts) OVER w))::BIGINT AS gap_sec
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        SELECT * FROM x
        WHERE event_type != prev_type AND gap_sec < 3600""",
    "window_last_scd1": """
        SELECT DISTINCT o_custkey,
               last_value(o_orderstatus) OVER (PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
                   AS last_status,
               min(o_orderdate) OVER k AS create_dt,
               CASE WHEN max(o_orderdate) OVER k = min(o_orderdate) OVER k
                    THEN NULL ELSE max(o_orderdate) OVER k
               END AS update_dt
        FROM orders WINDOW k AS (PARTITION BY o_custkey)""",
    "moving_sum_rows_frame": """
        SELECT event_id, user_id,
               (sum(round(value * 100)::BIGINT) OVER w)::DOUBLE / 100.0
                   AS trailing_sum,
               (count(*) OVER w)::INT AS n_in_frame
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)""",
    "range_frame_hour_sum": """
        WITH x AS (SELECT event_id, user_id,
                          floor(epoch(ts))::BIGINT AS sec,
                          round(value * 100)::BIGINT AS cents
                   FROM events)
        SELECT event_id, user_id,
               (sum(cents) OVER w)::DOUBLE / 100.0 AS hour_sum,
               (count(*) OVER w)::INT AS n_in_hour
        FROM x
        WINDOW w AS (PARTITION BY user_id ORDER BY sec
                     RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)""",
    "anti_join_no_orders": """
        SELECT c_custkey, c_name FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""",
    "semi_join_big_orders": """
        SELECT c_custkey, c_mktsegment FROM customer
        WHERE EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_totalprice > 300000.0)""",
    "union_labeled_rules": """
        SELECT o_orderkey, 'high_value' AS rule FROM orders
        WHERE o_totalprice > 400000.0
        UNION ALL
        SELECT o_orderkey, 'urgent' AS rule FROM orders
        WHERE o_orderpriority = '1-URGENT'""",
    "funnel_users": """
        WITH s1 AS (SELECT user_id, min(ts)::TIMESTAMP AS t_signup
                    FROM events WHERE event_type = 'signup'
                    GROUP BY user_id),
        s2 AS (SELECT e.user_id, s1.t_signup,
                      min(e.ts)::TIMESTAMP AS t_click
               FROM events e JOIN s1 ON e.user_id = s1.user_id
               WHERE e.event_type = 'click' AND e.ts > s1.t_signup
               GROUP BY e.user_id, s1.t_signup),
        s3 AS (SELECT e.user_id, s2.t_signup, s2.t_click,
                      min(e.ts)::TIMESTAMP AS t_purchase
               FROM events e JOIN s2 ON e.user_id = s2.user_id
               WHERE e.event_type = 'purchase' AND e.ts > s2.t_click
               GROUP BY e.user_id, s2.t_signup, s2.t_click)
        SELECT user_id, t_signup, t_click, t_purchase FROM s3""",
    "string_funcs_demo": """
        SELECT c_custkey,
               upper(c_name) AS name_upper,
               lower(c_mktsegment) AS seg_lower,
               substring(c_name, 1, 8) AS name_prefix,
               length(trim(c_name))::INT AS name_len,
               lpad(c_custkey::VARCHAR, 10, '0') AS key_padded,
               regexp_replace(c_name, '[0-9]', '#', 'g') AS name_masked,
               translate(c_mktsegment, 'AEIOU', 'aeiou') AS seg_translated
        FROM customer""",
    "null_handling_demo": """
        SELECT o_orderkey,
               nullif(o_orderstatus, 'O') AS closed_status,
               coalesce(nullif(o_orderstatus, 'O'), 'OPEN')
                   AS status_filled,
               (CASE WHEN nullif(o_orderstatus, 'O') IS NULL
                     THEN 1 ELSE 0 END)::INT AS is_open
        FROM orders""",
    "range_join_tumbling_rewrite": """
        WITH bounds AS (SELECT date_trunc('hour', min(ts))::TIMESTAMP lo,
                               date_trunc('hour', max(ts))::TIMESTAMP hi
                        FROM events),
        buckets AS (SELECT unnest(generate_series(lo, hi,
                               INTERVAL 1 HOUR)) AS bucket_start
                    FROM bounds),
        binned AS (SELECT date_trunc('hour', ts)::TIMESTAMP AS bucket_start,
                          count(*) AS n,
                          count(DISTINCT user_id) AS n_users
                   FROM events GROUP BY 1)
        SELECT b.bucket_start::TIMESTAMP AS bucket_start, x.n, x.n_users
        FROM binned x JOIN buckets b USING (bucket_start)""",
    "not_in_customers": """
        SELECT o_orderkey, o_custkey FROM orders
        WHERE o_custkey NOT IN (SELECT c_custkey FROM customer
                                WHERE c_mktsegment = 'AUTOMOBILE')""",
    "scalar_subquery_acctbal": """
        SELECT o_orderkey,
               (SELECT c_acctbal FROM customer WHERE c_custkey = o_custkey)
                   AS acctbal
        FROM orders""",
    "orders_calendar": """
        SELECT year(o_orderdate)::INT AS y, month(o_orderdate)::INT AS m,
               isodow(o_orderdate)::INT AS isodow, count(*) AS n
        FROM orders GROUP BY 1, 2, 3""",
    "percentile_prices": """
        SELECT l_returnflag,
               quantile_cont(l_quantity, 0.5) AS median_qty,
               quantile_cont(l_extendedprice, 0.25) AS p25_price,
               quantile_cont(l_extendedprice, 0.75) AS p75_price
        FROM lineitem GROUP BY l_returnflag""",
    "set_intersect_customers": """
        SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
        INTERSECT
        SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'""",
    "set_except_customers": """
        SELECT o_custkey AS custkey FROM orders
        EXCEPT
        SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'""",
    "last_week_threshold": f"""
        SELECT l_returnflag, count(*) AS n_rows,
               {_DSUM.format('l_extendedprice')} AS sum_price
        FROM lineitem
        WHERE l_shipdate >= (SELECT date_trunc('day', max(l_shipdate))
                                    ::TIMESTAMP - INTERVAL 7 DAY
                             FROM lineitem)
        GROUP BY l_returnflag""",
    "amount_diff_lag": """
        SELECT event_id, user_id,
               coalesce(value - lag(value) OVER (PARTITION BY user_id
                   ORDER BY ts, event_id), -1.0) AS amount_diff
        FROM events""",
    "rollup_status_priority": """
        SELECT coalesce(o_orderstatus, 'ALL') AS status,
               coalesce(o_orderpriority, 'ALL') AS priority,
               count(*) AS n,
               grouping(o_orderstatus)::INT AS g_status,
               grouping(o_orderpriority)::INT AS g_prio
        FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)""",
    "cube_status_priority": """
        SELECT coalesce(o_orderstatus, 'ALL') AS status,
               coalesce(o_orderpriority, 'ALL') AS priority,
               count(*) AS n,
               grouping(o_orderstatus)::INT AS g_status,
               grouping(o_orderpriority)::INT AS g_prio
        FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""",
    "distinct_parts_per_flag": """
        SELECT l_returnflag,
               count(DISTINCT l_partkey) AS n_parts,
               count(*) AS n_rows
        FROM lineitem GROUP BY l_returnflag""",
    "late_shipments": """
        SELECT l_orderkey, l_linenumber,
               floor((epoch(l_shipdate) - epoch(o_orderdate)) / 86400)
                   ::BIGINT AS days_late
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY""",
    "json_props_agg": """
        SELECT event_type, count(*) AS n,
               sum(CAST(regexp_extract(props, '"k": (-?\\d+)', 1)
                        AS BIGINT))::BIGINT AS sum_k
        FROM events GROUP BY event_type""",
    "tumbling_hourly": f"""
        SELECT date_trunc('hour', ts)::TIMESTAMP AS hour_start, event_type,
               count(*) AS n, {_DSUM.format('value')} AS sum_value
        FROM events GROUP BY 1, 2""",
    "asof_last_click": """
        SELECT event_id, user_id, ts::TIMESTAMP AS ts,
               max(CASE WHEN event_type = 'click' THEN ts::TIMESTAMP END)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS last_click_ts
        FROM events QUALIFY event_type = 'purchase'""",
    "asof_join_multikey": f"""
        WITH ev AS (
          SELECT event_id, user_id, ts::TIMESTAMP AS ts, event_type,
                 value,
                 ((regexp_extract(props, '"k": (-?\\d+)', 1)::BIGINT
                   % 4) + 4) % 4 AS chan
          FROM events),
        q0 AS (
          SELECT user_id, chan, ts, value,
                 row_number() OVER (PARTITION BY user_id, chan, ts
                                    ORDER BY event_id DESC) AS rq
          FROM ev WHERE event_type = 'view'),
        quotes AS (SELECT user_id, chan, ts, value FROM q0 WHERE rq = 1),
        trades AS (SELECT event_id, user_id, chan, ts FROM ev
                   WHERE event_type = 'purchase')
        SELECT t.event_id, t.user_id, t.chan, t.ts,
               CASE WHEN q.ts >= t.ts
                    - INTERVAL {ASOF_TOLERANCE_HOURS} HOUR
                    THEN q.ts END AS quote_ts,
               CASE WHEN q.ts >= t.ts
                    - INTERVAL {ASOF_TOLERANCE_HOURS} HOUR
                    THEN q.value END AS quote_value
        FROM trades t ASOF LEFT JOIN quotes q
          ON t.user_id = q.user_id AND t.chan = q.chan
             AND q.ts <= t.ts""",
    "chain_fraud_window": """
        WITH x AS (
          SELECT event_id, user_id, ts, event_type, value,
                 lag(event_type, 1) OVER w AS t1,
                 lag(event_type, 2) OVER w AS t2,
                 lag(value, 1) OVER w AS v1,
                 lag(value, 2) OVER w AS v2,
                 floor(epoch(ts))::BIGINT - floor(epoch(lag(ts, 2) OVER w))::BIGINT AS dsec
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        SELECT event_id, user_id, ts::TIMESTAMP AS ts FROM x
        WHERE event_type = 'purchase'
          AND t1 = 'error' AND t2 = 'error'
          AND v2 > v1 AND dsec < 86400""",
    # salting / partial-merge are plan rewrites: both oracles are the
    # plain one-shot GROUP BY the rewritten plans must reproduce
    "skew_salted_user_totals": f"""
        SELECT user_id, count(*)::BIGINT AS n,
               {_DSUM.format('value')} AS total
        FROM events GROUP BY user_id""",
    "rollup_merge_hourly": f"""
        SELECT date_trunc('hour', ts)::TIMESTAMP AS bucket_start,
               event_type, count(*)::BIGINT AS n,
               {_DSUM.format('value')} AS total
        FROM events GROUP BY 1, 2""",
    "window_rank_family": """
        SELECT o_orderkey, o_orderpriority,
               row_number() OVER w::INT AS rn,
               dense_rank() OVER w::INT AS drank,
               ntile(4) OVER w::INT AS quartile,
               percent_rank() OVER w AS prank,
               cume_dist() OVER w AS cdist
        FROM orders
        WINDOW w AS (PARTITION BY o_orderpriority
                     ORDER BY o_totalprice DESC, o_orderkey)""",
    "grouping_sets_priority_status": """
        SELECT o_orderpriority, o_orderstatus,
               count(*) AS n,
               grouping(o_orderpriority)::INT AS g_priority,
               grouping(o_orderstatus)::INT AS g_status
        FROM orders
        GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())""",
    "unpivot_status_counts": """
        WITH pv AS (
          SELECT o_orderpriority,
                 sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0
                     END)::BIGINT AS n_o,
                 sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0
                     END)::BIGINT AS n_f,
                 sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0
                     END)::BIGINT AS n_p
          FROM orders GROUP BY o_orderpriority)
        SELECT o_orderpriority, s.status,
               CASE s.status WHEN 'O' THEN n_o WHEN 'F' THEN n_f
                    ELSE n_p END AS n
        FROM pv CROSS JOIN (VALUES ('O'), ('F'), ('P')) s(status)""",
    "big_spenders_having": f"""
        SELECT o_custkey, count(*) AS n_orders,
               {_DSUM.format('o_totalprice')} AS total_spend
        FROM orders GROUP BY o_custkey
        HAVING {_DSUM.format('o_totalprice')} > 1500000""",
    "argmax_order_per_customer": """
        SELECT o_custkey, o_orderkey AS top_orderkey,
               o_totalprice AS top_totalprice
        FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                     row_number() OVER (PARTITION BY o_custkey
                         ORDER BY o_totalprice DESC, o_orderkey DESC) AS rn
              FROM orders) WHERE rn = 1""",
    "order_keys_csv": """
        SELECT o_custkey,
               list_aggr(list_sort(list(o_orderkey)), 'string_agg', ',')
                   AS orderkeys_csv
        FROM orders GROUP BY o_custkey""",
    "full_outer_user_hours": """
        WITH c AS (SELECT user_id, date_trunc('hour', ts) AS hour,
                          count(*) AS n_clicks
                   FROM events WHERE event_type = 'click'
                   GROUP BY user_id, hour),
        p AS (SELECT user_id, date_trunc('hour', ts) AS hour,
                     count(*) AS n_purchases
              FROM events WHERE event_type = 'purchase'
              GROUP BY user_id, hour)
        SELECT coalesce(c.user_id, p.user_id) AS user_id,
               coalesce(c.hour, p.hour) AS hour,
               coalesce(n_clicks, 0)::BIGINT AS n_clicks,
               coalesce(n_purchases, 0)::BIGINT AS n_purchases
        FROM c FULL OUTER JOIN p
          ON c.user_id = p.user_id AND c.hour = p.hour""",
    "window_nth_family": """
        SELECT o_orderkey, o_orderpriority,
               first_value(o_orderkey) OVER w AS first_key,
               nth_value(o_orderkey, 3) OVER w AS third_key,
               last_value(o_orderkey) OVER w AS last_key
        FROM orders
        WINDOW w AS (PARTITION BY o_orderpriority
                     ORDER BY o_orderdate, o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING
                              AND UNBOUNDED FOLLOWING)""",
}
