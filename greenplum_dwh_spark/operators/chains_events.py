"""General amount-guessing chain detector applied to the events stream.

Reuses the exact fn_find_summ_frauds state machine
(mart/chains.py, Data_mart.sql:2-106) with the events vocabulary:
``error`` = declined attempt, ``purchase`` = success, ``value`` =
amount. The ≥3-chain semantics are not expressible in plain SQL
without MATCH_RECOGNIZE/recursion (SURVEY.md §2.10 U3), so this is a
rows-only driver check; the machine's transition semantics are
golden-tested in tests/test_chains_unit.py and the SQL-expressible
fixed-lookback member of the family (chain_fraud_window) is
oracle-verified.
"""

from __future__ import annotations

import datetime as dt

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from greenplum_dwh_spark import schemas
from greenplum_dwh_spark.mart.chains import detect_chains_pd
from greenplum_dwh_spark.sources.tpch import Tables

OUT_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("fraud_ts", T.TimestampType()),
])

_RUN_TS = dt.datetime(2024, 2, 1)  # fixed: determinism for the driver
#: corpus-appropriate chain parameters — events arrive ~10 h apart per
#: user, so the bank constants (≥3, 20 min) would never fire; ≥2
#: declines within a 12 h in-chain budget exercises every transition.
MIN_DECLINES = 2
SEC_BUDGET = 43200


def chain_fraud_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    from greenplum_dwh_spark.shipping import ensure_shipped
    ensure_shipped(spark)  # workers must import this package
    ev = (Tables(spark, sf_dir).events
          .filter(F.col("event_type").isin("error", "purchase"))
          .select("user_id", F.col("ts").alias("trans_date"),
                  F.col("value").alias("amount"),
                  F.when(F.col("event_type") == "purchase",
                         F.lit(schemas.RESULT_SUCCESS))
                  .otherwise(F.lit(schemas.RESULT_DECLINED))
                  .alias("oper_result")))

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.assign(passport_num="", fio="", phone="")
        out = detect_chains_pd(pdf, _RUN_TS, MIN_DECLINES, SEC_BUDGET)
        return pd.DataFrame({
            "user_id": pdf["user_id"].iloc[0],
            "fraud_ts": out["fraud_dt"],
        }) if len(out) else pd.DataFrame(
            {"user_id": pd.Series(dtype="int64"),
             "fraud_ts": pd.Series(dtype="datetime64[us]")})

    return ev.groupBy("user_id").applyInPandas(run, OUT_SCHEMA)
