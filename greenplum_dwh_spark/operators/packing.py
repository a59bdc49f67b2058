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

from pyspark.sql import DataFrame, SparkSession
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


QUERIES = {"pack_documents": pack_documents}   # rows-only (stateful)
ORACLES: dict[str, str] = {}
