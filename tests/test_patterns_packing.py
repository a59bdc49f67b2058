"""Tests for the generic pattern matcher and the batch packer."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from greenplum_dwh_spark.operators.packing import (pack_batches,
                                                   pack_greedy_pd)
from greenplum_dwh_spark.operators.patterns import match_pattern
from greenplum_dwh_spark.sources.tpch import Tables


def test_match_pattern_reproduces_chain_fraud_window(spark, sf_dir):
    """The generic matcher instantiated with the chain pattern must
    produce exactly the oracle-checked chain_fraud_window result."""
    from greenplum_dwh_spark.operators.relational import chain_fraud_window
    ev = Tables(spark, sf_dir).events
    pattern = [
        lambda c: (c("event_type") == "error")
                  & (c("value") > c("value", -1)),
        lambda c: c("event_type") == "error",
        lambda c: c("event_type") == "purchase",
    ]
    got = (match_pattern(ev, key="user_id", order=["ts", "event_id"],
                         pattern=pattern, ts_col="ts", within_sec=86400)
           .select("event_id", "user_id", "ts"))
    expected = chain_fraud_window(spark, sf_dir)
    assert got.exceptAll(expected).count() == 0
    assert expected.exceptAll(got).count() == 0
    assert got.count() > 0


def test_match_pattern_requires_ts_for_within(spark, sf_dir):
    ev = Tables(spark, sf_dir).events
    with pytest.raises(ValueError, match="ts_col"):
        match_pattern(ev, key="user_id", order=["ts"],
                      pattern=[lambda c: F.lit(True)], within_sec=10)


def test_pack_greedy_pd_unit():
    pdf = pd.DataFrame({"doc_id": [1, 2, 3, 4, 5],
                        "shard": [0] * 5,
                        "n_tokens": [300, 300, 100, 600, 10]})
    out = pack_greedy_pd(pdf, budget=512)
    # 300 | 300+100 | 600 (oversized, own batch) | 10
    assert list(out["batch_id"]) == [1, 2, 2, 3, 4]


def test_pack_batches_respects_budget(spark, sf_dir):
    docs = Tables(spark, sf_dir).documents
    packed = pack_batches(docs).cache()
    assert packed.count() == docs.count()
    sums = (packed.groupBy("shard", "batch_id")
            .agg(F.sum("n_tokens").alias("total"),
                 F.count(F.lit(1)).alias("n_docs")))
    # every multi-doc batch stays within budget; oversized singletons
    # are the only allowed overflows
    bad = sums.filter((F.col("total") > 512) & (F.col("n_docs") > 1))
    assert bad.count() == 0
    # deterministic: same input -> same packing
    again = pack_batches(docs)
    assert packed.exceptAll(again).count() == 0


def test_padding_waste_length_sort_wins(spark, sf_dir):
    """Both strategies batch the same tokens; length-sorted batching
    can only reduce padding (per-shard rearrangement of the same
    multiset), and on this length-varied corpus it strictly does."""
    from greenplum_dwh_spark.operators.packing import (
        padding_waste_by_order)
    rows = {r["strategy"]: r
            for r in padding_waste_by_order(spark, sf_dir).collect()}
    a, s = rows["arrival"], rows["length_sorted"]
    assert a["total_tokens"] == s["total_tokens"]
    assert a["n_batches"] == s["n_batches"]
    for r in (a, s):
        assert r["padded_tokens"] >= r["total_tokens"]
        assert r["waste_tokens"] == r["padded_tokens"] - r["total_tokens"]
    assert s["waste_tokens"] < a["waste_tokens"]
