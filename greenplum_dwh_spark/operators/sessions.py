"""Sessionization — the custom stateful-operator slot of the engine
(U3 family: per-key ordered state machines, SURVEY.md §2.10).

``sessionize`` runs as ``groupBy(user).applyInPandas`` — the same
execution shape as the fraud rule-4 chain detector (mart/chains.py):
Arrow-batched per-key groups, bounded state, linear scale-out. Unlike
rule 4, session assignment IS relational-algebra-expressible (lag +
cumulative sum), so this operator gets a full DuckDB oracle — parity
here validates the applyInPandas machinery end-to-end against SQL
window semantics.

Gap semantics: a new session starts when the per-operand-floored
second gap exceeds SESSION_GAP_SEC (pandas: ns // 1e9 per timestamp,
matching Spark unix_timestamp and DuckDB floor(epoch())).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from greenplum_dwh_spark.sources.tpch import Tables

SESSION_GAP_SEC = 1800

SESSION_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("session_id", T.IntegerType()),
    T.StructField("n_events", T.LongType()),
    T.StructField("start_ts", T.TimestampType()),
    T.StructField("end_ts", T.TimestampType()),
])


def sessionize_pd(pdf: pd.DataFrame) -> pd.DataFrame:
    """Pure-pandas per-user sessionizer (unit-testable without Spark)."""
    pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
    sec = pdf["ts"].astype("int64") // 1_000_000_000  # floor epoch sec
    new_session = (sec - sec.shift(1)).fillna(0) > SESSION_GAP_SEC
    sid = new_session.cumsum().astype("int32") + 1
    g = pdf.assign(session_id=sid).groupby("session_id", as_index=False)
    out = g.agg(user_id=("user_id", "first"), n_events=("ts", "size"),
                start_ts=("ts", "min"), end_ts=("ts", "max"))
    return out[["user_id", "session_id", "n_events", "start_ts", "end_ts"]]


def sessionize(events: DataFrame) -> DataFrame:
    return (events.select("user_id", "event_id", "ts")
            .groupBy("user_id")
            .applyInPandas(lambda p: sessionize_pd(p), SESSION_SCHEMA))


def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sessionize(Tables(spark, sf_dir).events)


QUERIES = {"sessionize_events": sessionize_events}

ORACLES = {
    "sessionize_events": f"""
        WITH x AS (
          SELECT user_id, event_id, ts,
                 CASE WHEN floor(epoch(ts))::BIGINT
                           - floor(epoch(lag(ts) OVER w))::BIGINT
                           > {SESSION_GAP_SEC}
                      THEN 1 ELSE 0 END AS new_session
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        s AS (SELECT user_id, ts,
                     (sum(new_session) OVER (PARTITION BY user_id
                          ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) + 1)::INT AS session_id
              FROM x)
        SELECT user_id, session_id, count(*) AS n_events,
               min(ts)::TIMESTAMP AS start_ts, max(ts)::TIMESTAMP AS end_ts
        FROM s GROUP BY user_id, session_id""",
}
