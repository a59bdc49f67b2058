"""Token-budget batch packing — the training-data operator that groups
documents into batches whose summed token counts stay under a budget.

Greedy packing has a *reset-at-boundary* accumulator, which plain SQL
cannot express without recursion (the same class as the fraud chain
state machine, SURVEY.md §2.10 U3) — so this is an
``applyInPandas``-shaped stateful operator:

1. docs are hashed into ``n_shards`` shards (deterministic,
   embarrassingly parallel — at 100 TB each shard packs independently
   and shard count scales with the cluster);
2. within a shard, docs are packed in doc_id order by a pure-pandas
   greedy first-fit kernel (unit-testable without Spark);
3. output (doc_id, shard, batch_id, n_tokens) — batch_id unique within
   a shard; a doc longer than the budget gets its own batch.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from greenplum_dwh_spark.sources.tpch import Tables

TOKEN_BUDGET = 512
N_SHARDS = 8

PACK_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("shard", T.IntegerType()),
    T.StructField("batch_id", T.IntegerType()),
    T.StructField("n_tokens", T.IntegerType()),
])


def pack_greedy_pd(pdf: pd.DataFrame,
                   budget: int = TOKEN_BUDGET) -> pd.DataFrame:
    """Greedy first-fit packing of one shard, doc_id order."""
    pdf = pdf.sort_values("doc_id", kind="mergesort")
    batch_ids, batch, acc = [], 1, 0
    for n in pdf["n_tokens"]:
        if acc > 0 and acc + n > budget:
            batch += 1
            acc = 0
        acc += n
        batch_ids.append(batch)
    return pdf.assign(batch_id=pd.Series(batch_ids, index=pdf.index,
                                         dtype="int32"))


def pack_batches(docs: DataFrame, budget: int = TOKEN_BUDGET,
                 n_shards: int = N_SHARDS) -> DataFrame:
    """(doc_id, text) → (doc_id, shard, batch_id, n_tokens)."""
    from greenplum_dwh_spark.shipping import ensure_shipped
    ensure_shipped(docs.sparkSession)
    with_counts = docs.select(
        "doc_id",
        F.pmod(F.xxhash64("doc_id"), F.lit(n_shards)).cast("int")
        .alias("shard"),
        F.size(F.split("text", " ")).cast("int").alias("n_tokens"))

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        out = pack_greedy_pd(pdf, budget)
        return out[["doc_id", "shard", "batch_id", "n_tokens"]]

    return with_counts.groupBy("shard").applyInPandas(run, PACK_SCHEMA)


def pack_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pack_batches(Tables(spark, sf_dir).documents)


#: fixed-size batching parameters for the padding-waste estimator
BATCH_SIZE = 32
WASTE_SHARDS = 8


def padding_waste(docs: DataFrame, batch_size: int = BATCH_SIZE,
                  n_shards: int = WASTE_SHARDS) -> DataFrame:
    """Padding waste of fixed-size batching under two orderings —
    the measurement behind "sort by length before batching": a batch
    pads every sequence to its max length, so arrival-order batches
    (mixed lengths) waste Σ(max−len) tokens while length-sorted
    batches put similar lengths together.

    Per strategy: docs are sharded by the md5 recipe (NO global sort
    — ordering and batch ids are per-shard, the dataloader-sharding
    shape of ``shard_and_order``), batched by row position, and the
    waste is aggregated exactly: padded = Σ_batches n_in_batch·max_len,
    waste = padded − Σ len.  Returns one row per strategy
    (strategy, n_batches, total_tokens, padded_tokens, waste_tokens).
    Plan: one exchange per strategy on the shard key."""
    from greenplum_dwh_spark.functions.hashing import md5_bucket
    base = docs.select(
        "doc_id",
        md5_bucket(F.col("doc_id"), n_shards).alias("shard"),
        F.size(F.split("text", " ")).cast("long").alias("len"))

    def strategy(name: str, order_cols) -> DataFrame:
        w = Window.partitionBy("shard").orderBy(*order_cols)
        batched = base.withColumn(
            "batch",
            ((F.row_number().over(w) - 1) / batch_size)
            .cast("long"))
        per_batch = (batched.groupBy("shard", "batch")
                     .agg(F.count(F.lit(1)).alias("n"),
                          F.max("len").alias("mx"),
                          F.sum("len").alias("sm")))
        return (per_batch.agg(
                    F.count(F.lit(1)).alias("n_batches"),
                    F.sum("sm").alias("total_tokens"),
                    F.sum(F.col("n") * F.col("mx"))
                    .alias("padded_tokens"))
                .select(F.lit(name).alias("strategy"), "n_batches",
                        "total_tokens", "padded_tokens",
                        (F.col("padded_tokens") - F.col("total_tokens"))
                        .alias("waste_tokens")))

    arrival = strategy("arrival", [F.asc("doc_id")])
    by_len = strategy("length_sorted",
                      [F.asc("len"), F.asc("doc_id")])
    return arrival.unionByName(by_len)


def padding_waste_by_order(spark: SparkSession,
                           sf_dir: str) -> DataFrame:
    return padding_waste(Tables(spark, sf_dir).documents)


QUERIES = {"pack_documents": pack_documents,   # rows-only (stateful)
           "padding_waste_by_order": padding_waste_by_order}
ORACLES: dict[str, str] = {
    "padding_waste_by_order": f"""
        WITH base AS (
          SELECT doc_id,
                 ('0x' || substr(md5(doc_id::VARCHAR), 1, 6))::BIGINT
                     % {WASTE_SHARDS} AS shard,
                 len(string_split(text, ' '))::BIGINT AS len
          FROM documents),
        arr AS (
          SELECT shard, len,
                 (row_number() OVER (PARTITION BY shard
                                     ORDER BY doc_id) - 1)
                 // {BATCH_SIZE} AS batch
          FROM base),
        srt AS (
          SELECT shard, len,
                 (row_number() OVER (PARTITION BY shard
                                     ORDER BY len, doc_id) - 1)
                 // {BATCH_SIZE} AS batch
          FROM base),
        arr_b AS (SELECT shard, batch, count(*) AS n, max(len) AS mx,
                         sum(len) AS sm
                  FROM arr GROUP BY shard, batch),
        srt_b AS (SELECT shard, batch, count(*) AS n, max(len) AS mx,
                         sum(len) AS sm
                  FROM srt GROUP BY shard, batch)
        SELECT 'arrival' AS strategy, count(*)::BIGINT AS n_batches,
               sum(sm)::BIGINT AS total_tokens,
               sum(n * mx)::BIGINT AS padded_tokens,
               (sum(n * mx) - sum(sm))::BIGINT AS waste_tokens
        FROM arr_b
        UNION ALL
        SELECT 'length_sorted', count(*)::BIGINT, sum(sm)::BIGINT,
               sum(n * mx)::BIGINT, (sum(n * mx) - sum(sm))::BIGINT
        FROM srt_b""",
}
