"""Streaming benchmark (round-4 verdict item 6): measure the two
production streaming paths and write BENCH_stream_r{N}.json.

1. **Daily-file mart stream** — the reference's load→normalize→mart
   cadence as a file-source stream: the 3-day bank fixture is batch-
   ETL'd once (dims need SCD history), then the landing files are
   replayed ×N through the stream_expired_rules foreachBatch pipeline
   (one file per trigger, the daily-extract discipline).  Per-batch
   wall is dominated by micro-batch overhead at fixture size — that
   IS the relevant number for a daily-cadence stream (throughput
   scales with file size; the fixed cost per trigger is what a
   deployment must budget).

2. **CDC apply** — a seeded versioned table + N parquet change files
   drained one file per trigger through cdc_apply_foreach_batch
   (within-batch winner by seq → merge_upsert → copy-on-write
   commit).  Rows/s here measures the full merge+commit path, not
   just the stream plumbing.

Prints ONE JSON line and writes BENCH_stream_r08.json; per-batch
walls are recorded so a regression in either the fixed trigger cost
or the per-row merge cost is visible separately.
"""

from __future__ import annotations

import datetime as dt
import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

MART_REPLAYS = int(os.environ.get("STREAM_BENCH_REPLAYS", "7"))
CDC_BATCHES = int(os.environ.get("STREAM_BENCH_CDC_BATCHES", "8"))
CDC_BASE_ROWS = 100_000
INGEST_BATCHES = int(os.environ.get("STREAM_BENCH_INGEST_BATCHES",
                                    "5"))
CDC_ROWS_PER_BATCH = 10_000

OUT_PATH = os.path.join(REPO, "BENCH_stream_r12.json")


def cost_split(d1: float, w1: float, d10: float, w10: float) -> dict:
    """Fit ``wall = fixed + per_doc·docs`` through two (docs/batch,
    mean batch wall) legs — the decomposition the big-index probe
    exists to report: the fixed term is the index key scan (must stay
    flat as the corpus ages), the per-doc term must scale with the
    batch.  Degenerate inputs (equal batch sizes) yield None terms
    rather than a division blow-up."""
    per_doc = (w10 - w1) / (d10 - d1) if d10 > d1 else None
    return {
        "docs_per_batch": [round(d1, 1), round(d10, 1)],
        "mean_batch_wall_sec": [w1, w10],
        "fixed_sec_per_batch": (round(w1 - per_doc * d1, 3)
                                if per_doc is not None else None),
        "per_kdoc_sec": (round(per_doc * 1000, 3)
                         if per_doc is not None else None),
    }


def _timed(handler, walls: list):
    def h(df, bid):
        t0 = time.time()
        handler(df, bid)
        walls.append(round(time.time() - t0, 3))
    return h


def bench_mart_stream(spark, tmp: str) -> dict:
    import bank_fixture as bf

    from greenplum_dwh_spark.etl import normalize_transactions
    from greenplum_dwh_spark.mart import add_report_data
    from greenplum_dwh_spark.sources import load_landing_file
    from greenplum_dwh_spark.sources.landing import last_day_filter
    from greenplum_dwh_spark.streaming.mart_stream import (
        stream_expired_rules, stream_landing)
    from greenplum_dwh_spark.streaming.pipeline import current_dims
    from greenplum_dwh_spark.warehouse import Warehouse

    wh = Warehouse(spark, os.path.join(tmp, "wh"))
    paths = bf.write_extracts(spark, os.path.join(tmp, "extracts"))
    # batch ETL pass: dims need their SCD history before the stream
    for i, p in enumerate(paths):
        load_landing_file(wh, p)
        normalize_transactions(wh)
        add_report_data(wh, "scd2",
                        run_ts=dt.datetime(2020, 5, 2 + i, 23, 0))
    landing = os.path.join(tmp, "landing")
    os.makedirs(landing)
    for j in range(MART_REPLAYS):
        for p in paths:
            # extracts are Spark-written parquet DIRECTORIES with one
            # part file each; flatten to plain files so the landing
            # dir is a flat file-source stream (one file per trigger
            # = one daily extract per micro-batch)
            part = [f for f in os.listdir(p)
                    if f.endswith(".parquet")][0]
            shutil.copy(os.path.join(p, part), os.path.join(
                landing, f"r{j}_{os.path.basename(p)}"))
    n_rows = spark.read.parquet(landing).count()
    out_dir = os.path.join(tmp, "stream_out")
    run_ts = dt.datetime(2020, 5, 4, 23, 0)
    walls: list = []

    def handle(batch_df, batch_id):
        if batch_df.isEmpty():
            return
        scoped = last_day_filter(batch_df)
        out = stream_expired_rules(scoped, current_dims(wh), run_ts)
        out.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"batch_id={batch_id}"))

    stream = stream_landing(spark, landing)
    t0 = time.time()
    q = (stream.writeStream
         .foreachBatch(_timed(handle, walls))
         .option("checkpointLocation", os.path.join(out_dir, "_ckpt"))
         .outputMode("append")
         .trigger(availableNow=True).start())
    q.awaitTermination()
    wall = time.time() - t0
    return {
        "replays": MART_REPLAYS,
        "batches": len(walls),
        "input_rows": n_rows,
        "wall_sec": round(wall, 3),
        "rows_per_sec": round(n_rows / wall, 1),
        "batch_wall_sec": {
            "mean": round(sum(walls) / max(len(walls), 1), 3),
            "max": round(max(walls), 3) if walls else None,
            "min": round(min(walls), 3) if walls else None,
        },
    }


def bench_cdc_apply(spark, tmp: str) -> dict:
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from greenplum_dwh_spark.streaming.mart_stream import (
        cdc_apply_foreach_batch)
    from greenplum_dwh_spark.tablestore import TableStore

    schema = T.StructType([
        T.StructField("k", T.LongType()),
        T.StructField("s", T.StringType()),
        T.StructField("v", T.LongType())])
    store = TableStore(spark, os.path.join(tmp, "store"))
    store.init_versioned("t", schema, key_col="k")
    base = spark.range(CDC_BASE_ROWS).select(
        F.col("id").alias("k"),
        F.concat(F.lit("s"), F.col("id")).alias("s"),
        (F.col("id") * 10).alias("v"))
    store.overwrite_versioned("t", base)
    src = os.path.join(tmp, "cdc_src")
    os.makedirs(src)
    ch_schema = "k long, s string, v long, action string, seq long"
    n_rows = 0
    for b in range(CDC_BATCHES):
        # deterministic mixed batch: ~90% updates on a rotating key
        # slice, ~10% deletes, plus inserts beyond the base key range
        ch = spark.range(CDC_ROWS_PER_BATCH).select(
            ((F.col("id") * 97 + b * 31) % (CDC_BASE_ROWS + b * 500))
            .alias("k"),
            F.concat(F.lit(f"b{b}_"), F.col("id")).alias("s"),
            (F.col("id") + b).alias("v"),
            F.when(F.col("id") % 10 == 0, "delete")
            .otherwise("upsert").alias("action"),
            (F.col("id") + b * CDC_ROWS_PER_BATCH).alias("seq"))
        ch.coalesce(1).write.parquet(os.path.join(src, f"b{b}.parquet"))
        n_rows += CDC_ROWS_PER_BATCH
    walls: list = []
    handler = cdc_apply_foreach_batch(store, "t", "k", "seq")
    stream = (spark.readStream.schema(ch_schema)
              .option("maxFilesPerTrigger", 1)
              .parquet(src + "/*.parquet"))
    t0 = time.time()
    q = (stream.writeStream
         .foreachBatch(_timed(handler, walls))
         .option("checkpointLocation", os.path.join(tmp, "cdc_ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    wall = time.time() - t0
    final_rows = store.read("t").count()
    return {
        "batches": len(walls),
        "change_rows": n_rows,
        "base_rows": CDC_BASE_ROWS,
        "final_rows": final_rows,
        "wall_sec": round(wall, 3),
        "change_rows_per_sec": round(n_rows / wall, 1),
        "batch_wall_sec": {
            "mean": round(sum(walls) / max(len(walls), 1), 3),
            "max": round(max(walls), 3) if walls else None,
            "min": round(min(walls), 3) if walls else None,
        },
    }


def bench_cdc_pruned_scaling(spark, tmp: str) -> dict:
    """The round-5 verdict item-6 witness: per-batch CDC wall must
    scale with the buckets a batch TOUCHES, not the base size.  Two
    bases (1× and 10× rows), identical single-bucket change batches
    applied through (a) the pruned handler (read_buckets +
    only_buckets commit — the production path) and (b) a full-diff
    twin (read whole table, fingerprint both sides entirely — the
    pre-round-6 path).  Handlers are invoked directly (foreachBatch
    calling convention) so the row measures the merge+commit, not
    trigger overhead.  Expected shape: pruned per-batch wall ~flat
    across bases, full-diff wall growing with the base."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from greenplum_dwh_spark.operators.reconcile import merge_upsert
    from greenplum_dwh_spark.streaming.mart_stream import (
        cdc_apply_foreach_batch)
    from greenplum_dwh_spark.tablestore import TableStore

    schema = T.StructType([
        T.StructField("k", T.LongType()),
        T.StructField("v", T.LongType())])
    out: dict = {}
    # bases sized so the full-diff term is VISIBLE above the ~1 s
    # fixed per-batch job overhead (at 100 k/1 M rows both variants
    # measure scheduling, not scanning — the first cut of this row
    # showed two flat lines and proved nothing)
    for label, base_rows in (("base_1x", 10 * CDC_BASE_ROWS),
                             ("base_10x", 100 * CDC_BASE_ROWS)):
        store = TableStore(spark, os.path.join(tmp, f"sc_{label}"))
        store.init_versioned("t", schema, key_col="k")
        store.overwrite_versioned("t", spark.range(base_rows).select(
            F.col("id").alias("k"), (F.col("id") * 10).alias("v")))
        # change keys confined to ONE bucket (keys pre-filtered by the
        # same hash the store buckets on), 2 batches per variant
        keys = (spark.range(base_rows)
                .select(F.col("id").alias("k"))
                .withColumn("__b", F.pmod(F.xxhash64("k"), F.lit(16))
                            .cast("int"))
                .filter(F.col("__b") == 3).limit(2000).drop("__b")
                .collect())
        pruned = cdc_apply_foreach_batch(store, "t", "k", "seq")

        def full_diff(batch_df, batch_id):
            latest = batch_df.drop("seq")
            store.overwrite_versioned(
                "t", merge_upsert(store.read("t"), latest, "k"))

        walls: dict = {}
        for vname, handler in (("pruned", pruned),
                               ("full_diff", full_diff)):
            per_batch = []
            for b in range(2):
                ch = (spark.createDataFrame(
                    [(r["k"], 1000 + b) for r in keys],
                    "k long, v long")
                    .withColumn("action", F.lit("upsert"))
                    .withColumn("seq", F.lit(b)))
                t0 = time.time()
                handler(ch, b)
                per_batch.append(time.time() - t0)
            walls[vname] = round(min(per_batch), 3)
        out[label] = {"base_rows": base_rows,
                      "change_rows": len(keys),
                      "touched_buckets": 1,
                      "sec_per_batch": walls}
    p1 = out["base_1x"]["sec_per_batch"]["pruned"]
    p10 = out["base_10x"]["sec_per_batch"]["pruned"]
    f1 = out["base_1x"]["sec_per_batch"]["full_diff"]
    f10 = out["base_10x"]["sec_per_batch"]["full_diff"]
    out["pruned_10x_ratio"] = round(p10 / p1, 2) if p1 else None
    out["full_diff_10x_ratio"] = round(f10 / f1, 2) if f1 else None
    return out


def bench_quota_admission(spark, tmp: str) -> dict:
    """Budget-capped admission stream: the sf0.01 documents table
    drained one shard per trigger through
    quota_admission_foreach_batch with the default per-language token
    budget.  Per-batch wall covers the prior-spend ledger scan, the
    batch prefix sum and the two partition-overwrite writes."""
    from pyspark.sql import functions as F

    from greenplum_dwh_spark.streaming.mart_stream import (
        quota_admission_foreach_batch)
    from greenplum_dwh_spark.tablestore import TableStore

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL",
                            "/root/testdata/sf0.01")
    docs = (spark.read.parquet(os.path.join(sf_dir,
                                            "documents.parquet"))
            .select("doc_id", "text", "lang"))
    n_docs = docs.count()
    src = os.path.join(tmp, "quota_src")
    os.makedirs(src)
    n_batches = 4
    for b in range(n_batches):
        (docs.filter(F.pmod("doc_id", F.lit(n_batches)) == b)
         .coalesce(1).write.parquet(os.path.join(src, f"b{b}.parquet")))
    store = TableStore(spark, os.path.join(tmp, "quota_store"))
    walls: list = []
    handler = quota_admission_foreach_batch(store, "admitted", "spent")
    stream = (spark.readStream
              .schema("doc_id long, text string, lang string")
              .option("maxFilesPerTrigger", 1)
              .parquet(src + "/*.parquet"))
    t0 = time.time()
    q = (stream.writeStream
         .foreachBatch(_timed(handler, walls))
         .option("checkpointLocation", os.path.join(tmp, "quota_ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    wall = time.time() - t0
    admitted = store.read("admitted").count()
    return {
        "batches": len(walls),
        "input_docs": n_docs,
        "admitted_docs": int(admitted),
        "wall_sec": round(wall, 3),
        "batch_wall_sec": {
            "mean": round(sum(walls) / max(len(walls), 1), 3),
            "max": round(max(walls), 3) if walls else None,
            "min": round(min(walls), 3) if walls else None,
        },
    }


def bench_neardup_ingest(spark, tmp: str) -> dict:
    """Continuous near-dup corpus ingestion: the sf0.01 documents
    table (500 docs, carries the generator's planted near-dups)
    drained one shard per trigger through
    neardup_ingest_foreach_batch against an initially-empty corpus.
    Docs/s covers the full loop: batch shingle+minhash, index probe,
    exact verify, reject record, corpus+index append."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from greenplum_dwh_spark.streaming.mart_stream import (
        neardup_ingest_foreach_batch)
    from greenplum_dwh_spark.tablestore import TableStore

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL",
                            "/root/testdata/sf0.01")
    docs = (spark.read.parquet(os.path.join(sf_dir,
                                            "documents.parquet"))
            .select("doc_id", "text"))
    n_docs = docs.count()
    src = os.path.join(tmp, "ingest_src")
    os.makedirs(src)
    for b in range(INGEST_BATCHES):
        (docs.filter(F.pmod("doc_id", F.lit(INGEST_BATCHES)) == b)
         .coalesce(1).write.parquet(os.path.join(src, f"b{b}.parquet")))
    store = TableStore(spark, os.path.join(tmp, "ingest_store"))
    doc_schema = T.StructType([T.StructField("doc_id", T.LongType()),
                               T.StructField("text", T.StringType())])
    idx_schema = T.StructType([T.StructField("doc_id", T.LongType()),
                               T.StructField("band", T.StringType())])
    store.init_append("corpus", doc_schema)
    store.init_append("index", idx_schema)
    walls: list = []
    handler = neardup_ingest_foreach_batch(store, "corpus", "index",
                                           "rejects")
    stream = (spark.readStream.schema("doc_id long, text string")
              .option("maxFilesPerTrigger", 1)
              .parquet(src + "/*.parquet"))
    t0 = time.time()
    q = (stream.writeStream
         .foreachBatch(_timed(handler, walls))
         .option("checkpointLocation", os.path.join(tmp,
                                                    "ingest_ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    wall = time.time() - t0
    return {
        "batches": len(walls),
        "input_docs": n_docs,
        "accepted_docs": store.read("corpus").count(),
        "rejected_pairs": store.read("rejects").count(),
        "wall_sec": round(wall, 3),
        "docs_per_sec": round(n_docs / wall, 1),
        "batch_wall_sec": {
            "mean": round(sum(walls) / max(len(walls), 1), 3),
            "max": round(max(walls), 3) if walls else None,
            "min": round(min(walls), 3) if walls else None,
        },
    }


def bench_phash_ingest(spark, tmp: str) -> dict:
    """Streaming image near-dup ingest (round-10 verdict item 5 —
    the streaming face of ``image_phash_pairs``): the sf0.01
    documents table with the batch operator's planted twins (every
    50th long-enough doc gets a last-char-perturbed copy ≤ 4 hamming
    bits from its original) drained one shard per trigger through
    ``phash_ingest_foreach_batch`` against an initially-empty corpus.
    Base docs arrive first (pmod shards), the twins arrive as the
    LAST batch, so every planted pair crosses batches and must be
    rejected against the by-then-accepted originals.  Per-batch wall
    covers the pack+dHash Arrow pass, the 16-byte fingerprint-index
    band probe, the JVM ``bit_count(xor)`` verify and three
    ``_batch_id``-partitioned dynamic overwrites."""
    from pyspark.sql import functions as F

    from greenplum_dwh_spark.operators.dedup import (
        last_band_guard_metrics)
    from greenplum_dwh_spark.operators.multimodal_ops import (
        PHASH_TWIN_OFFSET, _planted_image_docs)
    from greenplum_dwh_spark.sources.tpch import Tables
    from greenplum_dwh_spark.streaming.mart_stream import (
        phash_ingest_foreach_batch)
    from greenplum_dwh_spark.tablestore import TableStore

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL",
                            "/root/testdata/sf0.01")
    docs = _planted_image_docs(Tables(spark, sf_dir))
    base = docs.filter(F.col("doc_id") < PHASH_TWIN_OFFSET)
    twins = docs.filter(F.col("doc_id") >= PHASH_TWIN_OFFSET)
    n_docs = docs.count()
    n_twins = twins.count()
    src = os.path.join(tmp, "phash_src")
    os.makedirs(src)
    n_base_batches = INGEST_BATCHES - 1
    for b in range(n_base_batches):
        (base.filter(F.pmod("doc_id", F.lit(n_base_batches)) == b)
         .coalesce(1).write.parquet(os.path.join(src, f"b{b}.parquet")))
    twins.coalesce(1).write.parquet(
        os.path.join(src, f"b{n_base_batches}.parquet"))
    store = TableStore(spark, os.path.join(tmp, "phash_store"))
    walls: list = []
    handler = phash_ingest_foreach_batch(store, "corpus", "index",
                                         "rejects")
    stream = (spark.readStream.schema("doc_id long, text string")
              .option("maxFilesPerTrigger", 1)
              .parquet(src + "/*.parquet"))
    t0 = time.time()
    q = (stream.writeStream
         .foreachBatch(_timed(handler, walls))
         .option("checkpointLocation", os.path.join(tmp, "phash_ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    wall = time.time() - t0
    guard = last_band_guard_metrics()
    return {
        "batches": len(walls),
        "input_docs": n_docs,
        "planted_twins": n_twins,
        "accepted_docs": store.read("corpus").count(),
        "rejected_pairs": store.read("rejects").count(),
        "index_rows": store.read("index").count(),
        "band_guard": guard,
        "wall_sec": round(wall, 3),
        "docs_per_sec": round(n_docs / wall, 1),
        "per_batch_wall_sec": walls,
        "batch_wall_sec": {
            "mean": round(sum(walls) / max(len(walls), 1), 3),
            "max": round(max(walls), 3) if walls else None,
            "min": round(min(walls), 3) if walls else None,
        },
    }


def bench_paragraph_dedup_stream(spark, tmp: str,
                                 seed_index_rows: int = 0,
                                 doc_multiplier: int = 1) -> dict:
    """First-wins paragraph dedup at ingest (round-8 twin, benched
    round 9 — round-8 verdict item 4): the sf0.01 documents table
    with the driver query's plant (a unique para per doc + one of
    five shared promo paragraphs, so cross-batch duplicates exist by
    construction) drained one contiguous doc_id range per trigger
    through paragraph_dedup_foreach_batch.  Per-batch wall covers the
    claimed-line-index probe, the core dedup, the partitioned dynamic
    overwrite and the anti-join index append; the per-batch list is
    recorded whole because the claim the row exists to check is
    FLATNESS — the index grows by distinct paragraphs, so batch cost
    must not trend with batches already ingested.

    ``seed_index_rows`` (round-9 verdict item 6 — the scale leg):
    pre-claim that many synthetic distinct long lines into the index
    BEFORE the stream starts, simulating a mature ingest whose index
    holds ~10⁶ claimed paragraphs.  The per-batch ban probe and the
    replay anti-join read ONLY the (lh, ln) key columns — a 12-byte/
    row column-pruned parquet scan — so per-batch wall must stay
    ~flat vs the fixture-scale leg even at a 1000× index.

    ``doc_multiplier`` (round-10 verdict item 6 — the decade leg):
    replicate the corpus that many times with DISTINCT ids and
    replica-tagged body text (replicas are not duplicates of each
    other, so per-doc work scales cleanly), holding the seeded index
    constant.  Two legs at 1× and 10× batch rows against the SAME
    index separate the per-batch FIXED cost (the index key scan,
    flat) from the PER-DOC cost (scales with the batch) — see the
    ``cost_split`` block main() derives from the pair."""
    from pyspark.sql import functions as F

    from greenplum_dwh_spark.operators.curation import (PARA_MIN_CHARS,
                                                        _line_key)
    from greenplum_dwh_spark.streaming.mart_stream import (
        paragraph_dedup_foreach_batch)
    from greenplum_dwh_spark.tablestore import TableStore

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL",
                            "/root/testdata/sf0.01")
    planted = F.concat(
        F.col("text"), F.lit("\npara unique to document "),
        F.col("doc_id").cast("string"),
        F.lit("\nok\nshared promotional paragraph block number "),
        (F.col("doc_id") % 5).cast("string"))
    raw = (spark.read.parquet(os.path.join(sf_dir,
                                           "documents.parquet"))
           .select("doc_id", "text"))
    if doc_multiplier > 1:
        # replicate BEFORE the plant so every derived line (body,
        # unique para) is replica-distinct — replicas must not be
        # near-copies of each other or the 10× leg would measure
        # banning, not per-doc cost
        raw = (raw.crossJoin(
            spark.range(doc_multiplier).select(
                F.col("id").alias("_rep")))
            .select((F.col("doc_id") + F.col("_rep") * 10_000_000)
                    .alias("doc_id"),
                    F.concat(F.col("text"), F.lit(" replica "),
                             F.col("_rep").cast("string"))
                    .alias("text")))
    docs = raw.select("doc_id", planted.alias("text"))
    n_docs = docs.count()
    lines = docs.select(F.explode(F.split("text", "\n")).alias("line")) \
        .filter(F.length("line") >= PARA_MIN_CHARS)
    n_long_lines = lines.count()
    n_batches = 4
    tag = (f"para{seed_index_rows}x{doc_multiplier}"
           if seed_index_rows or doc_multiplier > 1 else "para")
    src = os.path.join(tmp, f"{tag}_src")
    os.makedirs(src)
    # contiguous arrival ranges anchored at the ACTUAL id extent
    # (round-9 ADVICE: a [b*span,(b+1)*span) slice over 0 assumes
    # dense 0-based ids and silently drops the max-id doc when ids
    # start at 1 and n divides n_batches)
    lo, hi = docs.agg(F.min("doc_id"), F.max("doc_id")).first()
    span = -(-(hi - lo + 1) // n_batches)  # ceil over the id extent
    for b in range(n_batches):
        (docs.filter((F.col("doc_id") >= lo + b * span)
                     & (F.col("doc_id") < lo + (b + 1) * span))
         .coalesce(1).write.parquet(os.path.join(src, f"b{b}.parquet")))
    store = TableStore(spark, os.path.join(tmp, f"{tag}_store"))
    if seed_index_rows:
        # pre-claim a synthetic mature index: distinct long lines
        # disjoint from the fixture corpus (prefix never occurs in
        # the planted docs), keys computed by the handler's own
        # recipe, _batch_id = -1 so every batch's ban probe reads
        # them.  This is exactly the state a year-old ingest carries.
        from pyspark.sql import types as T
        store.init_append("claimed", T.StructType([
            T.StructField("line", T.StringType()),
            T.StructField("lh", T.LongType()),
            T.StructField("ln", T.IntegerType()),
            T.StructField("_batch_id", T.LongType())]))
        seed = (spark.range(seed_index_rows)
                .select(F.concat(
                    F.lit("synthetic pre-claimed paragraph line "),
                    F.col("id").cast("string")).alias("line")))
        store.append("claimed",
                     seed.select("line", *_line_key(F.col("line")))
                     .withColumn("_batch_id", F.lit(-1).cast("long")))
    walls: list = []
    handler = paragraph_dedup_foreach_batch(store, "clean", "claimed")
    stream = (spark.readStream.schema("doc_id long, text string")
              .option("maxFilesPerTrigger", 1)
              .parquet(src + "/*.parquet"))
    t0 = time.time()
    q = (stream.writeStream
         .foreachBatch(_timed(handler, walls))
         .option("checkpointLocation", os.path.join(tmp,
                                                    f"{tag}_ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    wall = time.time() - t0
    index_rows = store.read("claimed").count()
    clean = store.read("clean")
    return {
        "batches": len(walls),
        "input_docs": n_docs,
        "clean_docs": clean.count(),
        "input_long_lines": n_long_lines,
        "index_rows_seeded": seed_index_rows,
        "index_rows": int(index_rows),
        # < 1 ⇔ the stream actually deduplicated: the claimed-line
        # index holds DISTINCT paragraphs, input rows hold occurrences
        "claimed_vs_input": round(index_rows / max(n_long_lines, 1), 3),
        "dropped_paragraphs": int(clean.agg(
            F.sum("n_dropped")).collect()[0][0] or 0),
        "wall_sec": round(wall, 3),
        "docs_per_sec": round(n_docs / wall, 1),
        "per_batch_wall_sec": walls,
        "batch_wall_sec": {
            "mean": round(sum(walls) / max(len(walls), 1), 3),
            "max": round(max(walls), 3) if walls else None,
            "min": round(min(walls), 3) if walls else None,
        },
    }


def main() -> None:
    from greenplum_dwh_spark.session import get_spark
    spark = get_spark("bench_streaming",
                      extra_conf={"spark.ui.enabled": "false",
                                  "spark.sql.shuffle.partitions": "8"})
    spark.sparkContext.setLogLevel("ERROR")
    from bench import host_load
    tmp = tempfile.mkdtemp(prefix="bench_stream_")
    load_before = host_load()
    try:
        result = {
            "metric": "streaming_paths",
            "mart_stream": bench_mart_stream(spark, tmp),
            "cdc_apply": bench_cdc_apply(spark, tmp),
            "cdc_pruned_scaling": bench_cdc_pruned_scaling(spark, tmp),
            "neardup_ingest": bench_neardup_ingest(spark, tmp),
            # round-10 verdict item 5: the streaming face of
            # image_phash_pairs — multimodal near-dup ingest
            "phash_ingest": bench_phash_ingest(spark, tmp),
            "quota_admission": bench_quota_admission(spark, tmp),
            "paragraph_dedup_stream":
                bench_paragraph_dedup_stream(spark, tmp),
            # round-9 verdict item 6: same stream over a pre-claimed
            # ~10^6-row index — per-batch wall must stay ~flat (the
            # ban probe/replay reads column-prune to 12-byte keys)
            "paragraph_dedup_stream_bigindex":
                bench_paragraph_dedup_stream(
                    spark, tmp, seed_index_rows=1_000_000),
            # round-10 verdict item 6: 10× and 100× batch rows
            # against the SAME 10^6-row index — separates the
            # per-batch fixed cost (index key scan) from the per-doc
            # cost.  The first 10× run measured per-doc cost BELOW
            # the noise floor (negative fitted slope at 1250
            # docs/batch), so the fit uses the 100× lever arm and
            # the 10× point validates linearity as a residual.
            "paragraph_dedup_stream_bigindex_10x":
                bench_paragraph_dedup_stream(
                    spark, tmp, seed_index_rows=1_000_000,
                    doc_multiplier=10),
            "paragraph_dedup_stream_bigindex_100x":
                bench_paragraph_dedup_stream(
                    spark, tmp, seed_index_rows=1_000_000,
                    doc_multiplier=100),
        }
        b1 = result["paragraph_dedup_stream_bigindex"]
        b10 = result["paragraph_dedup_stream_bigindex_10x"]
        b100 = result["paragraph_dedup_stream_bigindex_100x"]
        d1 = b1["input_docs"] / max(b1["batches"], 1)
        d10 = b10["input_docs"] / max(b10["batches"], 1)
        d100 = b100["input_docs"] / max(b100["batches"], 1)
        split = cost_split(d1, b1["batch_wall_sec"]["mean"],
                           d100, b100["batch_wall_sec"]["mean"])
        if split["per_kdoc_sec"] is not None:
            pred10 = (split["fixed_sec_per_batch"]
                      + split["per_kdoc_sec"] * d10 / 1000)
            split["pred_10x_residual_sec"] = round(
                b10["batch_wall_sec"]["mean"] - pred10, 3)
        result["paragraph_dedup_bigindex_cost_split"] = split
        result["host"] = {"before": load_before, "after": host_load()}
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    with open(OUT_PATH, "w") as f:
        json.dump(result, f, indent=1, sort_keys=True)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
