"""Structured Streaming variant tests: file-source landing stream,
stateless expired rules over stream-static joins, stateful streaming
sessionization."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from greenplum_dwh_spark import schemas
from greenplum_dwh_spark.etl import normalize_transactions
from greenplum_dwh_spark.sources import load_landing_file
from greenplum_dwh_spark.streaming import mart_stream as MS
from tests import bank_fixture as bf

RUN = dt.datetime(2020, 5, 4, 0, 0, 0)


@pytest.fixture(scope="module")
def stream_setup(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("stream")
    from greenplum_dwh_spark.warehouse import Warehouse
    wh = Warehouse(spark, str(root / "wh"))
    paths = bf.write_extracts(spark, str(root / "extracts"))
    # batch-load dims first (streams join against current dim versions)
    for p in paths:
        load_landing_file(wh, p)
        normalize_transactions(wh)
    # landing stream dir = the day-3 extract filtered to its last day
    import shutil
    land_dir = root / "landing_stream"
    land_dir.mkdir()
    from greenplum_dwh_spark.sources.landing import (last_day_filter,
                                                     read_extract)
    day3 = last_day_filter(read_extract(spark, paths[2]))
    day3.coalesce(1).write.mode("overwrite").parquet(
        str(land_dir / "batch3.parquet"))
    return wh, str(land_dir)


def test_stream_expired_rules_matches_batch(spark, stream_setup):
    wh, land_dir = stream_setup
    dims = {
        "cards": wh.read("dim_cards_hist").filter(F.col("end_dt").isNull()),
        "accounts": wh.read("dim_accounts_hist")
                      .filter(F.col("end_dt").isNull()),
        "clients": wh.read("dim_clients_hist")
                     .filter(F.col("end_dt").isNull()),
    }
    stream = MS.stream_landing(spark, land_dir + "/batch3.parquet")
    out = MS.stream_expired_rules(stream, dims, RUN)
    assert out.isStreaming
    got = MS.run_stream_to_memory(out, "expired_stream", spark)
    rows = got.collect()
    # same day-3 seeded frauds as the batch mart: 2 passport + 4 account
    by_type = {}
    for r in rows:
        by_type.setdefault(r["fraud_type"], []).append(r)
    assert len(by_type[schemas.FRAUD_EXPIRED_PASSPORT]) == 2
    assert len(by_type[schemas.FRAUD_EXPIRED_ACCOUNT]) == 4


def test_stream_dedup_across_batches(spark, tmp_path):
    """A payload repeated in a later batch (within the watermark) is
    dropped; distinct payloads pass through."""
    import pandas as pd
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    b1 = pd.DataFrame({"doc_id": [1, 2],
                       "ts": pd.to_datetime([t0, t0]),
                       "text": ["alpha", "beta"]})
    b2 = pd.DataFrame({"doc_id": [3, 4],
                       "ts": pd.to_datetime(
                           [t0 + dt.timedelta(minutes=5)] * 2),
                       "text": ["alpha", "gamma"]})  # alpha is a dup
    src = tmp_path / "dd_src"
    src.mkdir()
    out, ckpt = str(tmp_path / "dd_out"), str(tmp_path / "dd_ckpt")
    schema = "doc_id bigint, ts timestamp, text string"

    def drain():
        stream = spark.readStream.schema(schema) \
            .parquet(str(src) + "/*.parquet")
        q = (MS.stream_dedup(stream)
             .writeStream.format("parquet")
             .option("path", out).option("checkpointLocation", ckpt)
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination()

    spark.createDataFrame(b1, schema).coalesce(1) \
        .write.parquet(str(src / "b1.parquet"))
    drain()
    spark.createDataFrame(b2, schema).coalesce(1) \
        .write.parquet(str(src / "b2.parquet"))
    drain()
    kept = sorted(r["text"] for r in spark.read.parquet(out).collect())
    assert kept == ["alpha", "beta", "gamma"]


def test_stream_watermark_drops_late_events(spark, tmp_path):
    """Tumbling windows with a 30-min watermark: an event arriving in a
    later batch but >30 min behind the max seen event time is dropped;
    finalized windows emit exactly once."""
    import pandas as pd
    t = lambda h, m: dt.datetime(2024, 1, 1, h, m, 0)
    batch1 = pd.DataFrame({
        "event_id": [1, 2, 3],
        "ts": pd.to_datetime([t(9, 10), t(9, 40), t(12, 0)]),
        "event_type": ["click", "click", "click"],
    })
    # 9:05 arrives after the watermark advanced to 11:30 -> dropped;
    # 12:10 is on time
    batch2 = pd.DataFrame({
        "event_id": [4, 5],
        "ts": pd.to_datetime([t(9, 5), t(12, 10)]),
        "event_type": ["click", "click"],
    })
    src = tmp_path / "wm_stream"
    src.mkdir()
    out = str(tmp_path / "wm_out")
    ckpt = str(tmp_path / "wm_ckpt")
    schema = "event_id bigint, ts timestamp, event_type string"

    def drain():
        stream = spark.readStream.schema(schema) \
            .parquet(str(src) + "/*.parquet")
        q = (MS.stream_tumbling_counts(stream)
             .writeStream.format("parquet")
             .option("path", out).option("checkpointLocation", ckpt)
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination()

    # run 1: only batch1 → watermark advances to 11:30 at its end
    spark.createDataFrame(batch1, schema).coalesce(1) \
        .write.parquet(str(src / "b1.parquet"))
    drain()
    # run 2: batch2 arrives; the checkpoint carries the watermark, so
    # the 9:05 event is late and dropped
    spark.createDataFrame(batch2, schema).coalesce(1) \
        .write.parquet(str(src / "b2.parquet"))
    drain()
    rows = {(r["window_start"], r["n"])
            for r in spark.read.parquet(out).collect()}
    # the 9:00 window finalized with 2 events (the late 9:05 dropped);
    # the 12:00 window never finalizes (watermark stops at 11:40)
    assert rows == {(t(9, 0), 2)}


def test_streaming_mart_parquet_sink_resumes(spark, stream_setup, tmp_path):
    """run_streaming_mart drains to a checkpointed parquet sink; a
    second invocation over the same landing dir processes nothing new
    (exactly-once via checkpoint)."""
    from greenplum_dwh_spark.streaming.pipeline import run_streaming_mart
    wh, land_dir = stream_setup
    out = str(tmp_path / "report_stream")
    run_streaming_mart(wh, land_dir + "/batch3.parquet", out, run_ts=RUN)
    first = spark.read.parquet(out).count()
    assert first == 6  # 2 passport + 4 account day-3 seeds
    run_streaming_mart(wh, land_dir + "/batch3.parquet", out, run_ts=RUN)
    assert spark.read.parquet(out).count() == first


def test_city_hop_foreach_batch_matches_batch_no_dups(spark, stream_setup,
                                                      tmp_path):
    """Rule 3 over a day delivered as TWO files (maxFilesPerTrigger=1 →
    two micro-batches): the handler re-runs the batch rule-3 operator
    per batch, and the report anti-join keeps the appended output
    identical to a single batch run — no duplicates
    (ref Data_mart.sql:281-293)."""
    from greenplum_dwh_spark.mart.rules import rule_city_hop
    from greenplum_dwh_spark.mart.staging import mart_staging
    wh, land_dir = stream_setup
    wh.truncate("report")
    expected = sorted(
        (r["fraud_dt"], r["passport"], r["fraud_type"])
        for r in rule_city_hop(mart_staging(wh, "scd2"), RUN).collect())
    assert expected  # fixture seeds C003's day-3 hop
    day3 = spark.read.parquet(land_dir + "/batch3.parquet")
    split = tmp_path / "hop_stream"
    split.mkdir()
    day3.filter(F.hour("trans_date") < 12).coalesce(1) \
        .write.parquet(str(split / "f1.parquet"))
    day3.filter(F.hour("trans_date") >= 12).coalesce(1) \
        .write.parquet(str(split / "f2.parquet"))
    stream = MS.stream_landing(spark, str(split) + "/*.parquet")
    q = (stream.writeStream
         .foreachBatch(MS.city_hop_foreach_batch(wh, RUN))
         .option("checkpointLocation", str(tmp_path / "hop_ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    got = sorted((r["fraud_dt"], r["passport"], r["fraud_type"])
                 for r in wh.read("report").collect())
    assert got == expected


def test_streaming_mart_fresh_dims_and_last_day(spark, tmp_path):
    """The foreachBatch pipeline re-resolves dim versions per micro-batch
    — dim rewrites whose vacuum deleted the previously-current version
    directories are picked up, not strand the stream — and applies the
    reference's last-day restriction per batch, so a cumulative
    multi-day landing file is scoped like the batch mart
    (Data_mart.sql:271-272)."""
    from greenplum_dwh_spark.streaming.pipeline import run_streaming_mart
    from greenplum_dwh_spark.warehouse import Warehouse
    wh = Warehouse(spark, str(tmp_path / "wh"))
    paths = bf.write_extracts(spark, str(tmp_path / "ex"))
    land = tmp_path / "land"
    land.mkdir()
    out = str(tmp_path / "rep_stream")

    # dims through day 2; stream file 1 = the cumulative day-2 extract
    # (days 1-2), so without the per-batch last-day filter day-1
    # transactions would be flagged too
    for p in paths[:2]:
        load_landing_file(wh, p)
        normalize_transactions(wh)
    spark.read.parquet(paths[1]).coalesce(1) \
        .write.parquet(str(land / "f1.parquet"))
    run_streaming_mart(wh, str(land) + "/*.parquet", out, run_ts=RUN)
    first = spark.read.parquet(out)
    assert first.filter(
        F.to_date("fraud_dt") != F.lit(bf.DAYS[1])).count() == 0
    n1 = first.count()
    assert n1 > 0  # expired-account seeds C010/C011 fire on day 2

    # day-3 ETL plus two extra rewrites per dim: the version dirs the
    # first drain read are now vacuumed (TableStore keeps only v, v-1)
    load_landing_file(wh, paths[2])
    normalize_transactions(wh)
    for d in ("dim_cards_hist", "dim_accounts_hist", "dim_clients_hist"):
        wh.overwrite_dim(d, wh.read(d))
        wh.overwrite_dim(d, wh.read(d))
    spark.read.parquet(paths[2]).coalesce(1) \
        .write.parquet(str(land / "f2.parquet"))
    run_streaming_mart(wh, str(land) + "/*.parquet", out, run_ts=RUN)
    got = spark.read.parquet(out)
    day3 = got.filter(F.to_date("fraud_dt") == F.lit(bf.DAYS[2]))
    # batch-mart day-3 scope: 2 expired-passport + 4 expired-account
    assert day3.count() == 6
    assert got.count() == n1 + 6


def test_stream_chain_detector_across_batches(spark, tmp_path):
    """A chain whose declines land in batch 1 and whose success lands in
    batch 2 must still be flagged — state survives micro-batches (the
    streaming form of the 20-min previous-day lookback)."""
    import decimal

    import pandas as pd
    t0 = dt.datetime(2020, 5, 2, 23, 45, 0)
    mk = lambda mins, amt, res: {
        "client": "C1",
        "trans_date": t0 + dt.timedelta(minutes=mins),
        "amount": decimal.Decimal(amt), "oper_result": res}
    batch1 = pd.DataFrame([mk(0, "9900.00", "Отказ"),
                           mk(5, "9800.00", "Отказ"),
                           mk(10, "9700.00", "Отказ")])
    batch2 = pd.DataFrame([mk(18, "9650.00", "Успешно"),
                           mk(30, "100.00", "Успешно")])
    src = tmp_path / "tx_stream"
    src.mkdir()
    schema = "client string, trans_date timestamp, amount decimal(18,2), oper_result string"
    # two separate files -> maxFilesPerTrigger=1 gives two micro-batches
    spark.createDataFrame(batch1, schema).coalesce(1) \
        .write.parquet(str(src / "b1.parquet"))
    spark.createDataFrame(batch2, schema).coalesce(1) \
        .write.parquet(str(src / "b2.parquet"))
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1)
              .parquet(str(src) + "/*.parquet"))
    got = MS.run_stream_to_memory(MS.stream_chain_detector(stream),
                                  "chains_stream", spark)
    rows = got.collect()
    assert len(rows) == 1
    assert rows[0]["client"] == "C1"
    assert rows[0]["fraud_dt"] == t0 + dt.timedelta(minutes=18)


def test_stream_sessionize_closed_sessions(spark, tmp_path):
    import pandas as pd
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    pdf = pd.DataFrame({
        "user_id": [1] * 5 + [2] * 2,
        "event_id": list(range(1, 8)),
        "ts": pd.to_datetime([
            t0, t0 + dt.timedelta(minutes=5),
            t0 + dt.timedelta(minutes=50),   # closes session 1 (45m gap)
            t0 + dt.timedelta(minutes=55),
            t0 + dt.timedelta(minutes=140),  # closes session 2 (85m gap)
            t0, t0 + dt.timedelta(minutes=100),  # user 2: closes s1
        ]),
    })
    src = tmp_path / "events_stream"
    spark.createDataFrame(pdf).coalesce(1).write.parquet(str(src))
    schema = spark.read.parquet(str(src)).schema
    stream = spark.readStream.schema(schema).parquet(str(src))
    got = MS.run_stream_to_memory(MS.stream_sessionize(stream),
                                  "sessions_stream", spark)
    rows = {(r["user_id"], r["session_id"]): r["n_events"]
            for r in got.collect()}
    # closed sessions only — the trailing open session stays in state
    assert rows == {(1, 1): 2, (1, 2): 2, (2, 1): 1}


def test_stream_interval_join_matches_batch(spark, tmp_path):
    """Stream-stream interval join (view→click attribution within 10
    minutes) over two file streams drained across two batches equals
    the batch join on the union of the data; a click outside the
    horizon never joins."""
    import pandas as pd
    t = lambda h, m: dt.datetime(2024, 1, 1, h, m, 0)
    views = pd.DataFrame({
        "event_id": [10, 11, 12],
        "ts": pd.to_datetime([t(9, 0), t(9, 30), t(10, 0)]),
        "user_id": [1, 1, 2]})
    clicks_b1 = pd.DataFrame({
        "event_id": [20, 21],
        "ts": pd.to_datetime([t(9, 5), t(9, 31)]),   # joins v10, v11
        "user_id": [1, 1]})
    clicks_b2 = pd.DataFrame({
        "event_id": [22, 23],
        "ts": pd.to_datetime([t(10, 9), t(10, 30)]),  # joins v12; 23 late
        "user_id": [2, 2]})
    schema = "event_id bigint, ts timestamp, user_id bigint"
    vdir, cdir = tmp_path / "views", tmp_path / "clicks"
    vdir.mkdir(), cdir.mkdir()
    out, ckpt = str(tmp_path / "ij_out"), str(tmp_path / "ij_ckpt")

    def drain():
        vs = spark.readStream.schema(schema).parquet(
            str(vdir) + "/*.parquet")
        cs = spark.readStream.schema(schema).parquet(
            str(cdir) + "/*.parquet")
        q = (MS.stream_interval_join(vs, cs)
             .writeStream.format("parquet")
             .option("path", out).option("checkpointLocation", ckpt)
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination()

    spark.createDataFrame(views, schema).coalesce(1) \
        .write.parquet(str(vdir / "b1.parquet"))
    spark.createDataFrame(clicks_b1, schema).coalesce(1) \
        .write.parquet(str(cdir / "b1.parquet"))
    drain()
    spark.createDataFrame(clicks_b2, schema).coalesce(1) \
        .write.parquet(str(cdir / "b2.parquet"))
    drain()

    got = sorted((r.view_id, r.click_id)
                 for r in spark.read.parquet(out).collect())
    # batch equivalent over the full data
    vb = spark.createDataFrame(views, schema)
    cb = spark.createDataFrame(pd.concat([clicks_b1, clicks_b2]), schema)
    want = sorted(
        (v.event_id, c.event_id)
        for v in vb.collect() for c in cb.collect()
        if v.user_id == c.user_id
        and v.ts <= c.ts <= v.ts + dt.timedelta(minutes=10))
    assert got == want
    assert (10, 20) in got and (12, 22) in got
    assert all(c != 23 for _, c in got), "click outside horizon joined"


def test_stream_maintains_continuous_rollup(spark, tmp_path):
    """foreachBatch → HourlyRollup.maintain: the continuous aggregate
    maintained from a file stream across two drains (plus a compact in
    between) equals the direct batch aggregation of all events."""
    import pandas as pd

    from greenplum_dwh_spark.operators.rollup_store import HourlyRollup
    from greenplum_dwh_spark.tablestore import TableStore
    t = lambda h, m: dt.datetime(2024, 1, 1, h, m, 0)
    b1 = pd.DataFrame({"ts": pd.to_datetime([t(9, 10), t(9, 50), t(10, 5)]),
                       "event_type": ["click", "click", "view"],
                       "value": [1.25, 2.50, 10.00]})
    b2 = pd.DataFrame({"ts": pd.to_datetime([t(9, 59), t(11, 0)]),
                       "event_type": ["click", "view"],
                       "value": [0.25, 4.75]})
    schema = "ts timestamp, event_type string, value double"
    src = tmp_path / "ev_src"
    src.mkdir()
    store = TableStore(spark, str(tmp_path / "store"))
    rollup = HourlyRollup(store)
    ckpt = str(tmp_path / "ru_ckpt")

    def drain():
        stream = spark.readStream.schema(schema).parquet(
            str(src) + "/*.parquet")
        q = (stream.writeStream
             .foreachBatch(lambda df, _id: rollup.maintain(df))
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination()

    spark.createDataFrame(b1, schema).coalesce(1) \
        .write.parquet(str(src / "b1.parquet"))
    drain()
    rollup.compact()
    spark.createDataFrame(b2, schema).coalesce(1) \
        .write.parquet(str(src / "b2.parquet"))
    drain()

    got = {(r.bucket_start, r.event_type): (r.n, r.sum_value)
           for r in rollup.query().collect()}
    allpdf = pd.concat([b1, b2])
    direct = spark.createDataFrame(allpdf, schema) \
        .groupBy(F.date_trunc("HOUR", "ts").alias("b"), "event_type") \
        .agg(F.count(F.lit(1)).alias("n"),
             (F.sum(F.round(F.col("value") * 100).cast("long"))
              .cast("double") / 100.0).alias("s"))
    want = {(r.b, r.event_type): (r.n, r.s) for r in direct.collect()}
    assert got == want


def test_stream_decontaminate_matches_batch(spark, tmp_path, sf_dir):
    """Stream-static decontamination over the documents corpus fed as
    one file-source batch must equal the batch operator's result on
    the same corpus (stream ≡ batch discipline).  The eval-gram side
    is static and broadcast; the stream side holds no state."""
    from greenplum_dwh_spark.operators.curation import (
        decontaminate_ngrams)
    docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id", "text",
                    F.lit(dt.datetime(2024, 1, 1)).alias("ts")))
    src = tmp_path / "dc_src"
    src.mkdir()
    docs.coalesce(1).write.parquet(str(src / "b1.parquet"))

    # static eval-gram set: reuse the batch operator's own derivation
    # by extracting the distinct grams of the eval slice via SQL over
    # the same expression the stream uses
    from greenplum_dwh_spark.operators.curation import DECON_N
    ev = (docs.filter(F.col("doc_id") % 97 == 0)
          .select(F.split("text", " ").alias("t"))
          .select(F.explode(F.expr(
              f"transform(sequence(1, greatest(size(t) - {DECON_N - 1},"
              f" 1)), i -> concat_ws(' ', slice(t, i, {DECON_N})))"))
              .alias("g"))
          .distinct())

    stream = (spark.readStream
              .schema("doc_id bigint, text string, ts timestamp")
              .parquet(str(src) + "/*.parquet")
              .filter(F.col("doc_id") % 97 != 0))
    q = (MS.stream_decontaminate(stream, ev)
         .writeStream.format("memory").queryName("dc_out")
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination()
    got = {(r.doc_id, r.n_hits)
           for r in spark.table("dc_out").collect()}
    want = {(r.doc_id, r.n_hits)
            for r in decontaminate_ngrams(spark, sf_dir)
            .select("doc_id", "n_hits").collect()}
    assert got == want


def test_stream_apply_cdc_matches_batch_merge(spark, tmp_path):
    """CDC change stream → foreachBatch merge_upsert into a versioned
    TableStore table: after two micro-batches the table equals the
    sequential batch application of the same changesets, within-batch
    same-key changes resolve by highest seq, and every micro-batch
    committed a time-travelable version."""
    from pyspark.sql import types as T

    from greenplum_dwh_spark.operators.reconcile import merge_upsert
    from greenplum_dwh_spark.streaming.mart_stream import (
        cdc_apply_foreach_batch)
    from greenplum_dwh_spark.tablestore import TableStore

    schema = T.StructType([
        T.StructField("k", T.LongType()),
        T.StructField("s", T.StringType()),
        T.StructField("v", T.LongType())])
    store = TableStore(spark, str(tmp_path / "store"))
    store.init_versioned("t", schema, key_col="k")
    base = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)],
        "k long, s string, v long")
    store.overwrite_versioned("t", base)
    v0 = store.current_version("t")

    ch_schema = "k long, s string, v long, action string, seq long"
    # batch 1: update k=2 twice (seq 2 wins), insert k=9
    b1 = [(2, "WRONG", 0, "upsert", 1), (2, "B", 200, "upsert", 2),
          (9, "z", 90, "upsert", 1)]
    # batch 2: delete k=1, update k=9
    b2 = [(1, None, None, "delete", 1), (9, "Z", 91, "upsert", 2)]
    src = tmp_path / "cdc_src"
    src.mkdir()
    handler = cdc_apply_foreach_batch(store, "t", "k", "seq")
    ckpt = str(tmp_path / "cdc_ckpt")

    def drain():
        stream = spark.readStream.schema(ch_schema).parquet(
            str(src) + "/*.parquet")
        q = (stream.writeStream.foreachBatch(handler)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination()

    for i, rows in enumerate([b1, b2]):
        spark.createDataFrame(rows, ch_schema).coalesce(1) \
            .write.parquet(str(src / f"b{i}.parquet"))
        drain()

    got = {r["k"]: (r["s"], r["v"]) for r in store.read("t").collect()}
    # independent batch model: apply the same per-batch winners in order
    expect = base
    for rows in [b1, b2]:
        ch = spark.createDataFrame(rows, ch_schema)
        latest = (ch.withColumn(
            "_rn", F.row_number().over(
                Window.partitionBy("k").orderBy(F.desc("seq"))))
            .filter("_rn = 1").drop("_rn", "seq"))
        expect = merge_upsert(expect, latest, "k")
    want = {r["k"]: (r["s"], r["v"]) for r in expect.collect()}
    assert got == want == {2: ("B", 200), 3: ("c", 30), 9: ("Z", 91)}
    # two CDC commits on top of the seed version; the previous one is
    # time-travelable (vacuum retains the last two versions)
    assert store.current_version("t") == v0 + 2
    mid = {r["k"]: (r["s"], r["v"])
           for r in store.read_version("t", v0 + 1).collect()}
    assert mid == {1: ("a", 10), 2: ("B", 200), 3: ("c", 30),
                   9: ("z", 90)}


def test_stream_kmv_sketch_equals_batch_sketch(spark, tmp_path):
    """Per-group KMV sketch maintained incrementally over two
    micro-batches is BIT-IDENTICAL to the one-pass batch sketch of
    all data (the exact-merge property), and its estimate is within
    the sketch's error bound of the true distinct count."""
    from pyspark.sql import types as T

    from greenplum_dwh_spark.functions.sketch import (kmv_estimate,
                                                      kmv_sketch)
    from greenplum_dwh_spark.streaming.mart_stream import (
        kmv_sketch_foreach_batch)
    from greenplum_dwh_spark.tablestore import TableStore

    k = 16
    schema = "grp string, user_id long"
    b1 = [("a", i) for i in range(120)] + [("b", i) for i in range(7)]
    b2 = [("a", i) for i in range(60, 200)] + [("c", i)
                                               for i in range(3)]
    store = TableStore(spark, str(tmp_path / "store"))
    store.init_versioned("sk", T.StructType([
        T.StructField("grp", T.StringType()),
        T.StructField("sketch", T.ArrayType(T.DoubleType()))]),
        key_col="grp")
    src = tmp_path / "kmv_src"
    src.mkdir()
    handler = kmv_sketch_foreach_batch(store, "sk", "grp", "user_id",
                                       k=k)
    ckpt = str(tmp_path / "kmv_ckpt")

    def drain():
        stream = spark.readStream.schema(schema).parquet(
            str(src) + "/*.parquet")
        q = (stream.writeStream.foreachBatch(handler)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination()

    for i, rows in enumerate([b1, b2]):
        spark.createDataFrame(rows, schema).coalesce(1) \
            .write.parquet(str(src / f"b{i}.parquet"))
        drain()

    got = {r["grp"]: r["sketch"]
           for r in store.read("sk").collect()}
    alldata = spark.createDataFrame(b1 + b2, schema)
    want = {r["grp"]: r["sketch"]
            for r in kmv_sketch(alldata, ["grp"], "user_id", k)
            .collect()}
    assert got == want                      # exact merge, bit-identical
    est = {r["grp"]: r["est"] for r in
           store.read("sk")
           .select("grp", kmv_estimate(F.col("sketch"), k).alias("est"))
           .collect()}
    truth = {"a": 200, "b": 7, "c": 3}
    assert est["b"] == 7.0 and est["c"] == 3.0   # below-k groups exact
    assert abs(est["a"] - truth["a"]) / truth["a"] < 0.5  # ~1/sqrt(k)


def test_stream_asof_enrich_matches_batch(spark, tmp_path):
    """Streaming PIT enrichment ≡ batch asof_join regardless of how
    facts split across micro-batches: two fact files drained through
    asof_enrich_foreach_batch against a static version table produce
    exactly the batch operator's output over the full fact set."""
    import datetime as dt

    from pyspark.sql import types as T

    from greenplum_dwh_spark.operators.timeseries import asof_join
    from greenplum_dwh_spark.streaming.mart_stream import (
        asof_enrich_foreach_batch)
    from greenplum_dwh_spark.tablestore import TableStore

    B = dt.datetime(2024, 1, 1)
    TS = lambda s: B + dt.timedelta(seconds=s)  # noqa: E731
    versions = spark.createDataFrame(
        [(1, TS(0), 100), (1, TS(50), 101), (2, TS(20), 200)],
        "k int, vt timestamp, price long")
    facts = [(1, i, TS(i * 7)) for i in range(10)] \
        + [(2, 100 + i, TS(i * 9)) for i in range(10)] \
        + [(3, 777, TS(5))]                 # key with no versions
    fact_schema = "k int, fid int, ft timestamp"

    store = TableStore(spark, str(tmp_path / "store"))
    out_cols = ["k", "fid", "ft", "vt", "price"]
    out_schema = T.StructType([
        T.StructField("k", T.IntegerType()),
        T.StructField("fid", T.IntegerType()),
        T.StructField("ft", T.TimestampType()),
        T.StructField("vt", T.TimestampType()),
        T.StructField("price", T.LongType()),
        T.StructField("_batch_id", T.LongType())])
    store.init_append("enriched", out_schema,
                      partition_cols=["_batch_id"])
    src = tmp_path / "asof_src"
    src.mkdir()
    handler = asof_enrich_foreach_batch(
        store, "enriched", versions, key="k", fact_time="ft",
        version_time="vt", version_tiebreak="price")
    ckpt = str(tmp_path / "asof_ckpt")

    def drain():
        stream = spark.readStream.schema(fact_schema).parquet(
            str(src) + "/*.parquet")
        q = (stream.writeStream.foreachBatch(handler)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination()

    half = len(facts) // 2
    for i, rows in enumerate([facts[:half], facts[half:]]):
        spark.createDataFrame(rows, fact_schema).coalesce(1) \
            .write.parquet(str(src / f"f{i}.parquet"))
        drain()

    def current():
        return sorted(tuple(r) for r in store.read("enriched")
                      .select(*out_cols).collect())

    got = current()
    want = sorted(tuple(r) for r in asof_join(
        spark.createDataFrame(facts, fact_schema), versions,
        key="k", fact_time="ft", version_time="vt",
        version_tiebreak="price").select(*out_cols).collect())
    assert got == want and len(got) == len(facts)
    # spot semantics: key 3 enriched with NULLs, key 1 fact at t=49
    # carries the t=0 version, at t=63 the t=50 version
    by_fid = {r[1]: r for r in got}
    assert by_fid[777][3] is None and by_fid[777][4] is None
    assert by_fid[7][4] == 100     # t=49 → version @0
    assert by_fid[9][4] == 101     # t=63 → version @50
    # at-least-once replay: re-running a batch through the handler
    # overwrites its _batch_id partition — table content unchanged
    handler(spark.createDataFrame(facts[half:], fact_schema), 1)
    assert current() == want


def test_stream_neardup_ingest_matches_batch_fold(spark, tmp_path):
    """Continuous near-dup corpus ingestion: three micro-batches
    through neardup_ingest_foreach_batch must reach exactly the
    accept/reject decisions of folding the asymmetric batch operator
    (incremental_minhash_pairs) over the same batches — including a
    duplicate of a doc accepted EARLIER IN THE STREAM (the index must
    grow between micro-batches, not just hold the seed corpus)."""
    from pyspark.sql import types as T

    from greenplum_dwh_spark.operators.dedup import (
        incremental_minhash_pairs)
    from greenplum_dwh_spark.streaming.mart_stream import (
        neardup_ingest_foreach_batch)
    from greenplum_dwh_spark.tablestore import TableStore

    # disjoint per-doc vocabularies: distinct docs share ZERO
    # 3-gram shingles (rotations of one vocabulary are accidental
    # near-dups — jac 0.73 — which this fixture must not plant)
    mk = lambda p: " ".join(f"{p}{i}" for i in range(15))  # noqa: E731
    t1, t2, t4, t7 = mk("a"), mk("b"), mk("c"), mk("d")
    t6 = t2.replace("b7", "zz")            # 1-word variant of t2
    batches = [
        [(1, t1), (2, t2)],
        [(3, t1), (4, t4)],                # 3 = exact dup of 1
        [(5, t4), (6, t6), (7, t7)],       # 5 = dup of 4 (accepted
    ]                                      # only one batch earlier)

    store = TableStore(spark, str(tmp_path / "store"))
    doc_schema = T.StructType([T.StructField("doc_id", T.LongType()),
                               T.StructField("text", T.StringType())])
    idx_schema = T.StructType([T.StructField("doc_id", T.LongType()),
                               T.StructField("band", T.StringType())])
    store.init_append("corpus", doc_schema)
    store.init_append("index", idx_schema)

    src = tmp_path / "docs_src"
    src.mkdir()
    handler = neardup_ingest_foreach_batch(store, "corpus", "index",
                                           "rejects")
    ckpt = str(tmp_path / "ingest_ckpt")

    def drain():
        stream = spark.readStream.schema(
            "doc_id long, text string").parquet(str(src) + "/*.parquet")
        q = (stream.writeStream.foreachBatch(handler)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination()

    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, doc_schema).coalesce(1) \
            .write.parquet(str(src / f"b{i}.parquet"))
        drain()

    # independent model: fold the asymmetric batch operator
    corpus_model: list = []
    rejects_model: set = set()
    for rows in batches:
        new_ids = {i for i, _ in rows}
        union = spark.createDataFrame(corpus_model + rows, doc_schema)
        pairs = incremental_minhash_pairs(
            union, F.col("doc_id").isin(list(new_ids)))
        rej = {(r["new_doc"], r["base_doc"], round(r["jac"], 9))
               for r in pairs.collect()}
        rejects_model |= rej
        rejected = {a for a, _, _ in rej}
        corpus_model += [r for r in rows if r[0] not in rejected]

    got_corpus = {(r["doc_id"], r["text"])
                  for r in store.read("corpus").collect()}
    assert got_corpus == set(corpus_model)
    got_rejects = {(r["new_doc"], r["base_doc"], round(r["jac"], 9))
                   for r in store.read("rejects").collect()}
    assert got_rejects == rejects_model
    # the planted ground truths
    assert (3, 1, 1.0) in got_rejects          # dup of the seed batch
    assert (5, 4, 1.0) in got_rejects          # dup of a MID-STREAM
    assert {1, 2, 4, 7} <= {d for d, _ in got_corpus}  # accept
    assert not {3, 5} & {d for d, _ in got_corpus}
    # the index holds bands for exactly the accepted docs
    assert ({r["doc_id"] for r in
             store.read("index").select("doc_id").distinct().collect()}
            == {d for d, _ in got_corpus})


def test_stream_neardup_ingest_hot_band_cap_matches_batch(spark, tmp_path):
    """Round-5 code review: the ingest handler capped bands on the
    INDEX-ONLY count (batch rows excluded, batch side never capped),
    while incremental_minhash_pairs caps on the combined new+base
    occupancy — so near the cap the two faces diverged: the stream
    rejected a dup whose band the batch itself pushed over the cap,
    the batch fold accepted it.  band_cap=1 plants exactly that case:
    doc 2 is an exact dup of accepted doc 1, every shared band holds
    1 index row + 1 batch row = 2 > cap, so BOTH faces must drop the
    band and ACCEPT doc 2 (recall loss by design, identically)."""
    from pyspark.errors import AnalysisException
    from pyspark.sql import types as T

    from greenplum_dwh_spark.operators.dedup import (
        incremental_minhash_pairs)
    from greenplum_dwh_spark.streaming.mart_stream import (
        neardup_ingest_foreach_batch)
    from greenplum_dwh_spark.tablestore import TableStore

    mk = lambda p: " ".join(f"{p}{i}" for i in range(15))  # noqa: E731
    tx, ty = mk("a"), mk("b")
    batches = [
        [(1, tx)],
        [(2, tx), (3, ty)],   # 2 = exact dup of 1, band pushed hot
    ]

    store = TableStore(spark, str(tmp_path / "store"))
    doc_schema = T.StructType([T.StructField("doc_id", T.LongType()),
                               T.StructField("text", T.StringType())])
    idx_schema = T.StructType([T.StructField("doc_id", T.LongType()),
                               T.StructField("band", T.StringType())])
    store.init_append("corpus", doc_schema)
    store.init_append("index", idx_schema)

    src = tmp_path / "docs_src"
    src.mkdir()
    handler = neardup_ingest_foreach_batch(store, "corpus", "index",
                                           "rejects", band_cap=1)
    ckpt = str(tmp_path / "ingest_ckpt")

    def drain():
        stream = spark.readStream.schema(
            "doc_id long, text string").parquet(str(src) + "/*.parquet")
        q = (stream.writeStream.foreachBatch(handler)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination()

    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, doc_schema).coalesce(1) \
            .write.parquet(str(src / f"b{i}.parquet"))
        drain()

    # independent model: fold the batch operator at the SAME cap
    corpus_model: list = []
    rejects_model: set = set()
    for rows in batches:
        new_ids = {i for i, _ in rows}
        union = spark.createDataFrame(corpus_model + rows, doc_schema)
        pairs = incremental_minhash_pairs(
            union, F.col("doc_id").isin(list(new_ids)), band_cap=1)
        rej = {(r["new_doc"], r["base_doc"]) for r in pairs.collect()}
        rejects_model |= rej
        rejected = {a for a, _ in rej}
        corpus_model += [r for r in rows if r[0] not in rejected]

    got_corpus = {(r["doc_id"], r["text"])
                  for r in store.read("corpus").collect()}
    assert got_corpus == set(corpus_model)
    try:
        got_rejects = {(r["new_doc"], r["base_doc"])
                       for r in store.read("rejects").collect()}
    except AnalysisException:
        got_rejects = set()  # zero-row overwrite leaves no footers
    assert got_rejects == rejects_model
    # the planted divergence: the hot band is dropped on BOTH faces,
    # so the exact dup is ACCEPTED by both (and nothing is rejected)
    assert {d for d, _ in got_corpus} == {1, 2, 3}
    assert got_rejects == set()
    # the streaming face's cap drops are observable like every other
    # banded path (the handler routes through _guarded_bands); the
    # fold re-ran the batch operator last, so re-run one stream batch
    # to make the stream's observation the most recent
    handler(spark.createDataFrame(batches[1], doc_schema), 1)
    from greenplum_dwh_spark.operators.dedup import (
        last_band_guard_metrics)
    g = last_band_guard_metrics()
    assert g is not None and g["dropped_rows"] >= 2  # idx+batch rows


def test_stream_quota_admission_matches_prefix_fold(spark, tmp_path):
    """Budget-capped admission stream: draining the corpus through
    micro-batches must equal the sequential prefix fold (per batch in
    arrival order, per group in deterministic hash order, admit while
    the group's cumulative — spent + every batch doc so far, skipped
    or not — stays <= budget; first overflow ends the group's batch),
    budgets must never overshoot, and
    replaying a batch must leave both tables unchanged (the
    batch-partitioned spent ledger makes the handler idempotent — an
    additive state table would double-count exactly here)."""
    import hashlib

    from greenplum_dwh_spark.streaming.mart_stream import (
        quota_admission_foreach_batch)
    from greenplum_dwh_spark.tablestore import TableStore

    cap = 120
    rows = []
    did = 0
    for lang, n in (("en", 12), ("de", 4), ("xx", 1)):
        for j in range(n):
            rows.append((did, " ".join(f"w{k}" for k in range(7 + did % 23)),
                         lang))
            did += 1
    batches = [rows[:6], rows[6:11], rows[11:]]

    def h60(doc_id):
        return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:15], 16)

    spent = {}
    want = set()
    for bid, b in enumerate(batches):
        per = {}
        for doc_id, text, lang in b:
            per.setdefault(lang, []).append((h60(doc_id), doc_id,
                                             len(text.split(" "))))
        for lang, docs in per.items():
            # PREFIX semantics, matching quota_sample/the handler: the
            # cumulative includes every doc in hash order (skipped docs
            # are NOT refunded), so the first overflow ends the group's
            # admissions for this batch.  The earlier greedy-fold model
            # (cum -= toks on overflow, keep admitting later docs) only
            # coincided with the implementation on this fixture
            # (round-6 ADVICE) — model what the operator actually does.
            cum = 0
            for _, doc_id, toks in sorted(docs):
                cum += toks
                if spent.get(lang, 0) + cum > cap:
                    break
                want.add((lang, doc_id, toks,
                          spent.get(lang, 0) + cum, bid))
        spent = {}
        for lang, doc_id, toks, cum, b_ in want:
            spent[lang] = max(spent.get(lang, 0), cum)

    src = tmp_path / "src"
    src.mkdir()
    for bid, b in enumerate(batches):
        spark.createDataFrame(b, "doc_id long, text string, lang string") \
            .coalesce(1).write.parquet(str(src / f"b{bid}.parquet"))
    store = TableStore(spark, str(tmp_path / "store"))
    handler = quota_admission_foreach_batch(store, "admitted", "spent",
                                            budget=cap)
    stream = (spark.readStream.schema("doc_id long, text string, lang string")
              .option("maxFilesPerTrigger", 1)
              .parquet(str(src) + "/*.parquet"))
    q = (stream.writeStream.foreachBatch(handler)
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination()

    def admitted_set():
        return {(r["lang"], r["doc_id"], r["toks"], r["cum_toks"],
                 r["_batch_id"])
                for r in store.read("admitted").collect()}

    # batch-local cum_toks in the table; the model tracked global cum —
    # compare on global: batch-local cum + prior spent == model's cum
    got = set()
    prior = {}
    for bid in range(len(batches)):
        rows_b = sorted((r for r in admitted_set() if r[4] == bid),
                        key=lambda r: r[3])
        base = dict(prior)
        for lang, doc_id, toks, cum_local, b_ in rows_b:
            got.add((lang, doc_id, toks,
                     base.get(lang, 0) + cum_local, b_))
            prior[lang] = max(prior.get(lang, 0),
                              base.get(lang, 0) + cum_local)
    assert got == want and len(want) >= 8
    # budgets never overshoot, per group
    per_lang = {}
    for lang, _, toks, _, _ in got:
        per_lang[lang] = per_lang.get(lang, 0) + toks
    assert all(v <= cap for v in per_lang.values())
    # the under-budget groups are admitted whole
    assert sum(1 for r in got if r[0] == "de") == 4
    assert sum(1 for r in got if r[0] == "xx") == 1

    # REPLAY batch 1: identical tables afterwards
    before_admit = admitted_set()
    before_spent = {tuple(r) for r in store.read("spent").collect()}
    handler(spark.createDataFrame(
        batches[1], "doc_id long, text string, lang string"), 1)
    assert admitted_set() == before_admit
    assert {tuple(r) for r in store.read("spent").collect()} \
        == before_spent


def test_stream_paragraph_dedup_matches_batch(spark, tmp_path):
    """First-wins paragraph dedup at ingest (round 8): three
    micro-batches through paragraph_dedup_foreach_batch must produce
    byte-identical cleaned docs to the batch operator over the
    concatenated corpus — including a paragraph first claimed
    MID-STREAM (the claimed-line index must grow between batches, not
    just hold the seed), the sub-floor exemption, and an intra-batch
    repeat.  Replay of the last batch must leave both tables
    unchanged (at-least-once foreachBatch)."""
    from pyspark.sql import types as T

    from greenplum_dwh_spark.operators.curation import (
        paragraph_dedup_core)
    from greenplum_dwh_spark.streaming.mart_stream import (
        paragraph_dedup_foreach_batch)
    from greenplum_dwh_spark.tablestore import TableStore

    shared1 = "every batch repeats this exact paragraph"
    shared2 = "a later paragraph claimed mid stream"
    batches = [
        [(1, shared1 + "\nfirst doc own content\nok"),
         (2, shared1 + "\nsecond doc own content")],
        [(3, shared2 + "\nthird doc own content\nok"),
         (4, shared1 + "\n" + shared2 + "\nfourth doc own content")],
        [(5, shared2 + "\nfifth doc own content\n" + shared2)],
    ]
    doc_schema = T.StructType([T.StructField("doc_id", T.LongType()),
                               T.StructField("text", T.StringType())])

    store = TableStore(spark, str(tmp_path / "store"))
    handler = paragraph_dedup_foreach_batch(store, "clean", "claimed")
    src = tmp_path / "docs_src"
    src.mkdir()
    ckpt = str(tmp_path / "pd_ckpt")

    def drain():
        stream = spark.readStream.schema(
            "doc_id long, text string").parquet(str(src) + "/*.parquet")
        q = (stream.writeStream.foreachBatch(handler)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination()

    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, doc_schema).coalesce(1) \
            .write.parquet(str(src / f"b{i}.parquet"))
        drain()

    all_rows = [r for b in batches for r in b]
    want = {(r["doc_id"], r["clean_text"], r["n_kept"], r["n_dropped"])
            for r in paragraph_dedup_core(
                spark.createDataFrame(all_rows, doc_schema)).collect()}
    got = {(r["doc_id"], r["clean_text"], r["n_kept"], r["n_dropped"])
           for r in store.read("clean")
           .select("doc_id", "clean_text", "n_kept", "n_dropped")
           .collect()}
    assert got == want
    by_id = {d: (t, k, dr) for d, t, k, dr in got}
    assert shared1 in by_id[1][0]                 # first claim kept
    assert shared1 not in by_id[2][0]             # same-batch later doc
    assert shared1 not in by_id[4][0]             # later-batch doc
    assert shared2 in by_id[3][0]                 # mid-stream claim
    assert shared2 not in by_id[4][0] and shared2 not in by_id[5][0]
    assert "ok" in by_id[3][0].split("\n")        # sub-floor exempt
    assert by_id[5] == ("fifth doc own content", 1, 2)  # intra repeat
    # claimed index: exactly the distinct long paragraphs, once each
    claims = [r["line"] for r in store.read("claimed").collect()]
    assert len(claims) == len(set(claims))
    assert {shared1, shared2} <= set(claims)
    assert "ok" not in set(claims)
    # at-least-once replay of the final batch: decisions and tables
    # unchanged (the banned probe excludes this batch's own claims)
    handler(spark.createDataFrame(batches[2], doc_schema), 2)
    got2 = {(r["doc_id"], r["clean_text"], r["n_kept"], r["n_dropped"])
            for r in store.read("clean")
            .select("doc_id", "clean_text", "n_kept", "n_dropped")
            .collect()}
    assert got2 == want
    assert sorted(r["line"] for r in store.read("claimed").collect()) \
        == sorted(claims)


def test_stream_phash_ingest_matches_batch_fold(spark, tmp_path):
    """Image near-dup ingest (round-10 verdict item 5 — the streaming
    face of image_phash_pairs): three micro-batches through
    phash_ingest_foreach_batch must reach exactly the accept/reject
    decisions of folding the symmetric batch operator over the same
    batches with the asymmetric contract (reject iff hamming ≤ dist
    of an EARLIER-ACCEPTED doc; within-batch near-dups both
    accepted) — including a planted twin of a doc accepted MID-STREAM
    and a doc rejected against TWO earlier-accepted bases.  Also
    pins replay idempotence: re-running a batch_id leaves every
    table unchanged (partition overwrite, not append)."""
    import random

    from pyspark.sql import types as T

    from greenplum_dwh_spark.operators.multimodal_ops import (
        image_phash_pairs)
    from greenplum_dwh_spark.streaming.mart_stream import (
        phash_ingest_foreach_batch)
    from greenplum_dwh_spark.tablestore import TableStore

    rng = random.Random(11)
    alpha = "abcdefghijklmnopqrstuvwxyz0123456789 "

    def mk(n=500):
        return "".join(rng.choice(alpha) for _ in range(n))

    def twin(t, ch="Z"):
        return t[:-1] + (("Y" if t[-1] == "Z" else ch))

    ta, tb, tc, td = mk(), mk(), mk(), mk()
    batches = [
        [(1, ta), (2, tb)],
        # 3 = twin of accepted 1; 4 and 9 are a WITHIN-batch twin
        # pair — both must be accepted
        [(3, twin(ta)), (4, tc), (9, twin(tc))],
        # 5 is within dist of BOTH 4 and 9 (two reject rows);
        # 6 is fresh
        [(5, twin(tc, "q")), (6, td)],
    ]

    store = TableStore(spark, str(tmp_path / "store"))
    doc_schema = T.StructType([T.StructField("doc_id", T.LongType()),
                               T.StructField("text", T.StringType())])
    handler = phash_ingest_foreach_batch(store, "corpus", "index",
                                         "rejects")
    src = tmp_path / "docs_src"
    src.mkdir()
    ckpt = str(tmp_path / "ingest_ckpt")

    def drain():
        stream = spark.readStream.schema(
            "doc_id long, text string").parquet(str(src) + "/*.parquet")
        q = (stream.writeStream.foreachBatch(handler)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination()

    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, doc_schema).coalesce(1) \
            .write.parquet(str(src / f"b{i}.parquet"))
        drain()

    # independent model: fold the symmetric batch operator with the
    # asymmetric earlier-accepted contract
    corpus_model: list = []
    rejects_model: set = set()
    for rows in batches:
        new_ids = {i for i, _ in rows}
        corpus_ids = {i for i, _ in corpus_model}
        union = spark.createDataFrame(corpus_model + rows, doc_schema)
        rej = set()
        for r in image_phash_pairs(union).collect():
            a, b, hm = r["doc_a"], r["doc_b"], r["hamming"]
            if a in corpus_ids and b in new_ids:
                rej.add((b, a, hm))
            elif b in corpus_ids and a in new_ids:
                rej.add((a, b, hm))
        rejects_model |= rej
        rejected = {n for n, _, _ in rej}
        corpus_model += [r for r in rows if r[0] not in rejected]

    got_corpus = {(r["doc_id"], r["text"])
                  for r in store.read("corpus")
                  .select("doc_id", "text").collect()}
    assert got_corpus == set(corpus_model)
    got_rejects = {(r["new_doc"], r["base_doc"], r["hamming"])
                   for r in store.read("rejects")
                   .select("new_doc", "base_doc", "hamming").collect()}
    assert got_rejects == rejects_model
    # planted ground truths
    assert {n for n, _, _ in got_rejects} == {3, 5}
    assert {b for n, b, _ in got_rejects if n == 3} == {1}
    assert {b for n, b, _ in got_rejects if n == 5} == {4, 9}
    assert {d for d, _ in got_corpus} == {1, 2, 4, 9, 6}
    # the index holds one 16-byte fingerprint row per accepted doc,
    # and the stored hashes equal the kernel's
    idx = store.read("index").select("doc_id", "h1", "h2").collect()
    assert {r["doc_id"] for r in idx} == {1, 2, 4, 9, 6}
    assert len(idx) == 5
    from greenplum_dwh_spark.multimodal.codec import (dhash_bmp,
                                                      encode_bmp)
    want1 = dhash_bmp(encode_bmp(ta.encode(), width=16))
    got1 = next(r for r in idx if r["doc_id"] == 1)
    assert (got1["h1"], got1["h2"]) == want1

    # replay idempotence: re-deliver the LAST batch under its own
    # batch_id — dynamic partition overwrite must leave every table
    # byte-identical, and the probe must not reject the replayed
    # docs against their own half-committed fingerprints
    last_bid = max(r["_batch_id"]
                   for r in store.read("index").collect())
    handler(spark.createDataFrame(batches[-1], doc_schema),
            int(last_bid))
    assert {(r["doc_id"], r["text"]) for r in store.read("corpus")
            .select("doc_id", "text").collect()} == set(corpus_model)
    assert {(r["new_doc"], r["base_doc"], r["hamming"])
            for r in store.read("rejects")
            .select("new_doc", "base_doc", "hamming")
            .collect()} == rejects_model
    assert store.read("index").count() == 5


def test_stream_phash_ingest_guard_drops_observed(spark, tmp_path):
    """At band_cap=1 an exact dup's every shared band holds 1 index
    + 1 batch row = 2 > cap, so the stream face drops all its bands
    and ACCEPTS the dup — recall loss by design, and it must be
    OBSERVED via last_band_guard_metrics, never silent (the batch
    operator would instead engage its hot-split; the streaming face's
    documented posture is guard + observables)."""
    from pyspark.sql import types as T

    from greenplum_dwh_spark.operators.dedup import (
        last_band_guard_metrics)
    from greenplum_dwh_spark.streaming.mart_stream import (
        phash_ingest_foreach_batch)
    from greenplum_dwh_spark.tablestore import TableStore

    t = "x" * 500
    store = TableStore(spark, str(tmp_path / "store"))
    doc_schema = T.StructType([T.StructField("doc_id", T.LongType()),
                               T.StructField("text", T.StringType())])
    handler = phash_ingest_foreach_batch(store, "corpus", "index",
                                         "rejects", band_cap=1)
    handler(spark.createDataFrame([(1, t)], doc_schema), 0)
    handler(spark.createDataFrame([(2, t)], doc_schema), 1)
    # the exact dup was accepted (all its bands were hot + dropped)
    assert {r["doc_id"] for r in store.read("corpus")
            .select("doc_id").collect()} == {1, 2}
    assert store.read("rejects").count() == 0
    m = last_band_guard_metrics()
    assert m is not None and m["dropped_rows"] == 16  # 8 bands × 2
    assert m["max_band_size"] == 2


def test_stream_paragraph_dedup_legacy_index_migration(spark, tmp_path):
    """Round-9 ADVICE (medium): resuming a paragraph-dedup stream
    over a PRE-round-9 claimed-line index — (line, _batch_id) only,
    no (lh, ln) key columns — must not raise on the pruned key reads
    and must not silently un-ban the legacy claims.  Handler creation
    performs a one-shot backfill deriving the keys from the stored
    verbatim line; afterwards (a) the index carries correct non-NULL
    keys for every legacy row and (b) a new batch repeating a
    legacy-claimed paragraph drops it.  The mixed-file shape (new
    appends beside old files → NULL keys on old rows) is exercised
    too."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from greenplum_dwh_spark.streaming.mart_stream import (
        paragraph_dedup_foreach_batch)
    from greenplum_dwh_spark.tablestore import TableStore

    claimed_line = "a paragraph claimed before the round nine schema"
    store = TableStore(spark, str(tmp_path / "store"))
    # simulate the pre-round-9 index: parquet files with the OLD
    # schema written straight into the store's table directory
    legacy_schema = T.StructType([
        T.StructField("line", T.StringType()),
        T.StructField("_batch_id", T.LongType())])
    spark.createDataFrame([(claimed_line, 0)], legacy_schema) \
        .coalesce(1).write.mode("overwrite") \
        .parquet(str(tmp_path / "store" / "claimed"))

    handler = paragraph_dedup_foreach_batch(store, "clean", "claimed")
    idx = store.read("claimed")
    assert {"line", "lh", "ln", "_batch_id"} <= set(idx.columns)
    row = idx.filter(F.col("line") == claimed_line).collect()
    assert len(row) == 1
    want_key = spark.range(1).select(
        F.xxhash64(F.lit(claimed_line)).alias("lh"),
        F.length(F.lit(claimed_line)).alias("ln")).first()
    assert (row[0]["lh"], row[0]["ln"]) == (want_key["lh"],
                                            want_key["ln"])
    # the legacy claim still bans: a new doc repeating it loses the
    # line, keeps its own content
    doc_schema = T.StructType([T.StructField("doc_id", T.LongType()),
                               T.StructField("text", T.StringType())])
    handler(spark.createDataFrame(
        [(7, claimed_line + "\nfresh doc own paragraph body")],
        doc_schema), 1)
    got = store.read("clean").filter(F.col("doc_id") == 7).first()
    assert got["clean_text"] == "fresh doc own paragraph body"
    assert (got["n_kept"], got["n_dropped"]) == (1, 1)

    # mixed-file shape: an old-schema file appended beside the new
    # ones — read may infer the merged/new schema with NULL keys on
    # the old rows; a fresh handler must backfill those rows too
    stale_line = "another legacy claim arriving as a null keyed row"
    spark.createDataFrame([(stale_line, 0)], legacy_schema) \
        .coalesce(1).write.mode("append") \
        .parquet(str(tmp_path / "store" / "claimed"))
    # and a DOUBLE-CLAIM: round-9 code over a legacy index re-appends
    # an already-claimed line (NULL-key rows escape its replay
    # anti-join) — the repair must collapse it to one keyed row,
    # because the hashed core now relies on index-key uniqueness
    spark.createDataFrame([(claimed_line, 3)], legacy_schema) \
        .coalesce(1).write.mode("append") \
        .parquet(str(tmp_path / "store" / "claimed"))
    handler2 = paragraph_dedup_foreach_batch(store, "clean", "claimed")
    idx2 = store.read("claimed")
    assert idx2.filter(F.col("lh").isNull()).count() == 0
    assert idx2.filter(F.col("line") == stale_line).count() == 1
    assert idx2.filter(F.col("line") == claimed_line).count() == 1
    # the survivor must carry the EARLIEST _batch_id (round-10
    # ADVICE): an arbitrary survivor could carry batch 3, and a
    # replay of exactly batch 3 would then exclude the row from its
    # ban probe and un-ban a line first claimed by batch 0
    assert (idx2.filter(F.col("line") == claimed_line)
            .first()["_batch_id"]) == 0
    handler2(spark.createDataFrame(
        [(8, stale_line + "\neighth doc own paragraph body")],
        doc_schema), 2)
    got8 = store.read("clean").filter(F.col("doc_id") == 8).first()
    assert got8["clean_text"] == "eighth doc own paragraph body"


def test_stream_paragraph_dedup_migration_crash_recovery(spark, tmp_path):
    """Round-10 ADVICE (medium): the legacy-index repair must be
    crash-safe.  The repair writes the fixed rows durably to a
    ``__repair`` side table and swaps it into place with two renames;
    this test reconstructs each crash window's on-disk state and
    asserts a fresh handler recovers WITHOUT losing claims.

    Window A (between the two renames): index dir gone, complete
    repair table present, legacy rows parked in ``__repair_bak`` —
    the old truncate-then-append code would have re-initialised an
    empty index here and silently un-banned every prior claim.
    Window B (crash during/after the repair write, index untouched):
    a stale ``__repair`` beside a still-legacy index — must be
    discarded and the migration re-derived."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from greenplum_dwh_spark.streaming.mart_stream import (
        paragraph_dedup_foreach_batch)
    from greenplum_dwh_spark.tablestore import TableStore

    line = "a paragraph whose claim must survive the crash"
    base = tmp_path / "store"
    store = TableStore(spark, str(base))
    key = spark.range(1).select(
        F.xxhash64(F.lit(line)).alias("lh"),
        F.length(F.lit(line)).alias("ln")).first()
    new_schema = T.StructType([
        T.StructField("line", T.StringType()),
        T.StructField("lh", T.LongType()),
        T.StructField("ln", T.IntegerType()),
        T.StructField("_batch_id", T.LongType())])
    legacy_schema = T.StructType([
        T.StructField("line", T.StringType()),
        T.StructField("_batch_id", T.LongType())])
    doc_schema = T.StructType([T.StructField("doc_id", T.LongType()),
                               T.StructField("text", T.StringType())])

    # window A: mid-swap — repaired table complete, index dir absent
    spark.createDataFrame([(line, key["lh"], key["ln"], 0)], new_schema) \
        .coalesce(1).write.mode("overwrite") \
        .parquet(str(base / "claimed__repair"))
    spark.createDataFrame([(line, 0)], legacy_schema) \
        .coalesce(1).write.mode("overwrite") \
        .parquet(str(base / "claimed__repair_bak"))
    assert not (base / "claimed").exists()
    handler = paragraph_dedup_foreach_batch(store, "clean", "claimed")
    idx = store.read("claimed")
    assert idx.count() == 1
    row = idx.first()
    assert (row["line"], row["lh"], row["ln"]) == (line, key["lh"],
                                                   key["ln"])
    assert not (base / "claimed__repair").exists()
    assert not (base / "claimed__repair_bak").exists()
    # the recovered claim still bans
    handler(spark.createDataFrame(
        [(5, line + "\nsurvivor doc own paragraph body")],
        doc_schema), 1)
    got = store.read("clean").filter(F.col("doc_id") == 5).first()
    assert got["clean_text"] == "survivor doc own paragraph body"
    assert (got["n_kept"], got["n_dropped"]) == (1, 1)

    # window B: stale repair beside a still-legacy index — the stale
    # side table must be dropped and the migration re-derived from
    # the intact index (its content is deliberately WRONG to prove
    # it is discarded, not swapped in)
    store2 = TableStore(spark, str(tmp_path / "store2"))
    spark.createDataFrame([(line, 0)], legacy_schema) \
        .coalesce(1).write.mode("overwrite") \
        .parquet(str(tmp_path / "store2" / "claimed"))
    spark.createDataFrame(
        [("poison row from a half-written repair", 1, 1, 9)],
        new_schema).coalesce(1).write.mode("overwrite") \
        .parquet(str(tmp_path / "store2" / "claimed__repair"))
    paragraph_dedup_foreach_batch(store2, "clean", "claimed")
    idx2 = store2.read("claimed")
    assert idx2.count() == 1
    row2 = idx2.first()
    assert (row2["line"], row2["lh"], row2["ln"]) == (line, key["lh"],
                                                      key["ln"])
    assert not (tmp_path / "store2" / "claimed__repair").exists()
