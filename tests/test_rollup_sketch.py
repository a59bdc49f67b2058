"""Tests: continuous hourly rollup (incremental == direct, compaction
invariant) and the KMV sketch (mergeability, estimate accuracy)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from greenplum_dwh_spark.functions.sketch import (DEFAULT_K, kmv_estimate,
                                                  kmv_merge, kmv_sketch)
from greenplum_dwh_spark.operators.rollup_store import HourlyRollup
from greenplum_dwh_spark.sources.tpch import Tables
from greenplum_dwh_spark.tablestore import TableStore


@pytest.fixture()
def events3(spark, sf_dir):
    """events split into 3 deterministic batches."""
    ev = Tables(spark, sf_dir).events
    return ev, [ev.filter(F.pmod(F.col("event_id"), F.lit(3)) == i)
                for i in range(3)]


def _norm(df):
    return {(r["bucket_start"], r["event_type"]):
            (r["n"], round(r["sum_value"], 2))
            for r in df.collect()}


def test_rollup_incremental_equals_direct(spark, sf_dir, tmp_path,
                                          events3):
    ev, batches = events3
    store = TableStore(spark, str(tmp_path / "rollup"))
    ru = HourlyRollup(store)
    for b in batches:
        ru.maintain(b)
    direct = (ev.select(F.date_trunc("HOUR", "ts").alias("bucket_start"),
                        "event_type", "value")
              .groupBy("bucket_start", "event_type")
              .agg(F.count(F.lit(1)).alias("n"),
                   (F.sum(F.round(F.col("value") * 100).cast("long"))
                    .cast("double") / 100.0).alias("sum_value")))
    assert _norm(ru.query()) == _norm(direct)
    # compaction shrinks storage but never changes answers
    before_rows = store.read(HourlyRollup.TABLE).count()
    ru.compact()
    after_rows = store.read(HourlyRollup.TABLE).count()
    assert after_rows <= before_rows
    assert _norm(ru.query()) == _norm(direct)
    # further maintenance after compaction still correct
    ru.maintain(batches[0])
    q = _norm(ru.query())
    d0 = _norm(direct)
    assert all(q[k][0] >= d0[k][0] for k in d0)


def test_kmv_sketch_merge_equals_sketch_of_union(spark, sf_dir):
    ev = Tables(spark, sf_dir).events
    a = ev.filter(F.col("event_id") % 2 == 0)
    b = ev.filter(F.col("event_id") % 2 == 1)
    sk_a = kmv_sketch(a, ["event_type"], "user_id")
    sk_b = kmv_sketch(b, ["event_type"], "user_id")
    merged = (sk_a.alias("x").join(sk_b.alias("y"), "event_type")
              .select("event_type",
                      kmv_merge(F.col("x.sketch"), F.col("y.sketch"))
                      .alias("sketch")))
    direct = kmv_sketch(ev, ["event_type"], "user_id")
    m = {r["event_type"]: r["sketch"] for r in merged.collect()}
    d = {r["event_type"]: r["sketch"] for r in direct.collect()}
    assert m == d  # deterministic construction → exact equality


def test_kmv_estimate_accuracy(spark, sf_dir):
    ev = Tables(spark, sf_dir).events
    est = (kmv_sketch(ev, ["event_type"], "user_id")
           .select("event_type", kmv_estimate(F.col("sketch"))
                   .alias("d_hat")))
    exact = (ev.groupBy("event_type")
             .agg(F.countDistinct("user_id").alias("d")))
    joined = {r["event_type"]: (r["d_hat"], r["d"])
              for r in est.join(exact, "event_type").collect()}
    for etype, (d_hat, d) in joined.items():
        assert abs(d_hat - d) / d < 0.3, (etype, d_hat, d)


def test_space_saving_guarantee_and_error_bound(spark):
    """Parallel Space-Saving: every item with true frequency >
    N/capacity must appear; every reported count is an overestimate by
    at most max_err; on a corpus whose distinct count fits the
    capacity the counts are exact."""
    import random

    from pyspark.sql import functions as F

    from greenplum_dwh_spark.functions.sketch import frequent_items
    rng = random.Random(7)
    # Zipf-ish: token_0 dominates, long uniform tail of 5000 rares
    items = (["hot_a"] * 4000 + ["hot_b"] * 2500 + ["hot_c"] * 1500
             + [f"rare_{rng.randrange(5000)}" for _ in range(4000)])
    rng.shuffle(items)
    df = spark.createDataFrame([(x,) for x in items], "item string") \
        .repartition(8)
    exact = {r["item"]: r["n"] for r in
             df.groupBy("item").agg(F.count("*").alias("n")).collect()}
    n = len(items)
    cap = 64
    got = {r["item"]: (r["count_est"], r["max_err"])
           for r in frequent_items(df, "item", capacity=cap,
                                   top_k=10).collect()}
    for item, true_n in exact.items():
        if true_n > n / cap:
            assert item in got, f"guaranteed heavy hitter {item} missing"
    for item, (est, err) in got.items():
        true_n = exact.get(item, 0)
        assert true_n <= est <= true_n + err, (item, true_n, est, err)
    # small-cardinality input (fits capacity): exact, zero error
    small = spark.createDataFrame(
        [(f"t{i % 5}",) for i in range(100)], "item string").repartition(4)
    for r in frequent_items(small, "item", capacity=64, top_k=5).collect():
        assert r["count_est"] == 20 and r["max_err"] == 0
