"""End-to-end streaming fraud mart: landing file stream → stateless
expired rules → parquet report sink with checkpointing.

This is the production wiring of the pieces in mart_stream.py — a
continuously running variant of the reference's daily
load→normalize→mart cadence. Dimensions are served static per
micro-batch (stream-static join semantics re-read them, so SCD updates
from the batch ETL are picked up between triggers); the report sink is
append-only with a checkpoint directory for exactly-once file output.
"""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from greenplum_dwh_spark.streaming.mart_stream import (stream_expired_rules,
                                                       stream_landing)


def current_dims(wh) -> dict:
    return {
        "cards": wh.read("dim_cards_hist")
                   .filter(F.col("end_dt").isNull()),
        "accounts": wh.read("dim_accounts_hist")
                      .filter(F.col("end_dt").isNull()),
        "clients": wh.read("dim_clients_hist")
                     .filter(F.col("end_dt").isNull()),
    }


def run_streaming_mart(wh, landing_dir: str, out_dir: str,
                       run_ts: dt.datetime | None = None,
                       available_now: bool = True):
    """Start (and, with available_now, drain) the streaming mart.

    Returns the StreamingQuery; with ``available_now`` the call blocks
    until all currently-available landing files are processed — the
    trigger discipline matching the reference's batch-per-day loads.
    """
    if run_ts is None:
        run_ts = dt.datetime.utcnow()
    stream = stream_landing(wh.spark, landing_dir)
    out = stream_expired_rules(stream, current_dims(wh), run_ts)
    writer = (out.writeStream
              .format("parquet")
              .option("path", out_dir)
              .option("checkpointLocation",
                      os.path.join(out_dir, "_checkpoint"))
              .outputMode("append"))
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
    else:
        q = writer.start()
    return q
