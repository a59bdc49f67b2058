"""Bucketed co-located joins — the Spark equivalent of the reference's
DISTRIBUTED BY co-location (DDL.sql:40,59; SURVEY.md §1.4). Writing
both join sides bucketed by the join key removes the shuffle from the
join entirely; at 100 TB this converts the biggest exchange of a
fact-fact join into a map-side zip of bucket files."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from greenplum_dwh_spark.plans import checks
from greenplum_dwh_spark.sources.tpch import Tables


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    # managed tables land in ./spark-warehouse (gitignored);
    # warehouse.dir is a static conf so we can't point it at tmp
    t = Tables(spark, sf_dir)
    for name, df, key in [("b_lineitem", t.lineitem, "l_orderkey"),
                          ("b_orders", t.orders, "o_orderkey")]:
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (df.write.bucketBy(8, key).sortBy(key)
         .mode("overwrite").saveAsTable(name))
    yield "b_lineitem", "b_orders"
    for name in ("b_lineitem", "b_orders"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    li_name, o_name = bucketed_tables
    li, o = spark.table(li_name), spark.table(o_name)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        joined = (li.join(o, li.l_orderkey == o.o_orderkey)
                  .groupBy("o_orderpriority")
                  .agg(F.count(F.lit(1)).alias("n")))
        plan = checks.physical_plan(joined)
        # sort-merge join with ZERO exchanges before it: bucket
        # co-location replaced the shuffle
        join_part = plan.split("HashAggregate")[-1]
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in join_part
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
                       str(32 * 1024 * 1024))
        spark.conf.set("spark.sql.adaptive.enabled", "true")


def test_bucketed_join_results_match_unbucketed(spark, sf_dir,
                                                bucketed_tables):
    li_name, o_name = bucketed_tables
    t = Tables(spark, sf_dir)
    bucketed = (spark.table(li_name)
                .join(spark.table(o_name),
                      F.col("l_orderkey") == F.col("o_orderkey"))
                .groupBy("o_orderpriority").count().collect())
    plain = (t.lineitem
             .join(t.orders, t.lineitem.l_orderkey == t.orders.o_orderkey)
             .groupBy("o_orderpriority").count().collect())
    assert sorted((r["o_orderpriority"], r["count"]) for r in bucketed) \
        == sorted((r["o_orderpriority"], r["count"]) for r in plain)
