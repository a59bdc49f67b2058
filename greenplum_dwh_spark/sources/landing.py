"""Landing ingestion — the insert_from_excel.py equivalent.

The reference loads cumulative daily Excel extracts, keeps only the
newest day present in each file (insert_from_excel.py:27 — files are
cumulative so older days are already loaded) and bulk-inserts into the
landing table (insert_from_excel.py:30-48).

Spark-side: pandas reads the extract (no OSS-native Spark xlsx reader;
CSV/parquet extracts go through ``spark.read`` directly with the
declared schema), a typed DataFrame is created via Arrow, the last-day
filter is a catalyst-planned filter against a scalar max, and the write
is a bulk parquet append. The reference's per-cell SQL-literal
rendering (insert_from_excel.py:7-14) is obsolete under typed
DataFrames.
"""

from __future__ import annotations

import datetime as dt
import decimal
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from greenplum_dwh_spark import schemas

#: Positional mapping, Excel header -> landing schema
#: (insert_from_excel.py:30-38 maps positionally; FIXTURES.md §1).
EXTRACT_COLUMNS = [f.name for f in schemas.LANDING.fields]


def read_extract(spark: SparkSession, path: str) -> DataFrame:
    """Read one transactions extract (xlsx / csv / parquet) as a typed
    landing DataFrame. Columns are mapped positionally like the
    reference loader."""
    ext = os.path.splitext(path)[1].lower()
    if ext == ".parquet":
        df = spark.read.parquet(path)
        return _positional(spark, df)
    if ext == ".csv":
        df = (spark.read.option("header", "true")
              .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
              .csv(path))
        return _positional(spark, df, cast=True)
    # xlsx via pandas bridge (insert_from_excel.py:22). No OSS-native
    # Spark xlsx reader exists; pandas needs openpyxl, which this
    # container doesn't ship — fail with a clear remedy rather than a
    # deep pandas stack.
    try:
        import openpyxl  # noqa: F401
    except ImportError as e:
        raise ImportError(
            "xlsx ingestion needs openpyxl (not installed here); "
            "convert the extract to parquet/csv or install openpyxl"
        ) from e
    import pandas as pd
    pdf = pd.read_excel(path)
    pdf.columns = EXTRACT_COLUMNS
    # timestamp -> date coercions the reference applies client-side
    # (insert_from_excel.py:24-25)
    for c in ("account_valid_to", "date_of_birth", "passport_valid_to"):
        pdf[c] = pd.to_datetime(pdf[c]).dt.date
    pdf["trans_date"] = pd.to_datetime(pdf["trans_date"])
    pdf["amount"] = pdf["amount"].map(
        lambda x: decimal.Decimal(str(x)).quantize(decimal.Decimal("0.01")))
    pdf = pdf.astype({c: str for c in (
        "trans_id", "card_num", "account_num", "client", "passport_num")})
    return spark.createDataFrame(pdf, schema=schemas.LANDING)


def _positional(spark: SparkSession, df: DataFrame, cast: bool = False) -> DataFrame:
    cols = []
    for field, src in zip(schemas.LANDING.fields, df.columns):
        c = F.col(src)
        if cast:
            c = c.cast(field.dataType)
        cols.append(c.alias(field.name))
    return df.select(*cols)


def last_day_filter(df: DataFrame) -> DataFrame:
    """Keep only rows of the newest day in the extract
    (insert_from_excel.py:27: ``df[date] == max(date).date()``).

    Expressed as a max-aggregate broadcast-joined back so the plan stays
    fully distributed (no driver collect in the data path)."""
    mx = df.agg(F.max(F.to_date("trans_date")).alias("_max_day"))
    return (df.join(F.broadcast(mx),
                    F.to_date("trans_date") == F.col("_max_day"), "inner")
            .drop("_max_day"))


def load_landing_file(wh, path: str) -> int:
    """Full loader entry point: read extract → last-day filter → append
    to landing. Returns rows loaded."""
    df = read_extract(wh.spark, path)
    day = last_day_filter(df)
    n = day.count()
    wh.append("landing", day)
    return n
