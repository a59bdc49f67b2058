"""Landing ingestion — the insert_from_excel.py equivalent.

The reference loads cumulative daily Excel extracts, keeps only the
newest day present in each file (insert_from_excel.py:27 — files are
cumulative so older days are already loaded) and bulk-inserts into the
landing table (insert_from_excel.py:30-48).

Spark-side: xlsx extracts go through the zero-dependency lite reader
(sources/xlsx_lite.py) and CSV/parquet through ``spark.read`` with the
declared schema; a typed DataFrame is created, the last-day filter is a
catalyst-planned filter against a scalar max, and the write is a bulk
parquet append. The reference's per-cell SQL-literal rendering
(insert_from_excel.py:7-14) is obsolete under typed DataFrames.
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
    """Read one transactions extract (xlsx / csv / jsonl / parquet /
    orc) as a typed
    landing DataFrame. Columns are mapped positionally like the
    reference loader."""
    ext = os.path.splitext(path)[1].lower()
    if ext == ".parquet":
        df = spark.read.parquet(path)
        return _positional(spark, df)
    if ext == ".orc":
        # ORC is Spark-native; typed footer schema like parquet, so
        # the positional mapping needs no casts
        df = spark.read.orc(path)
        return _positional(spark, df)
    if ext == ".csv":
        df = (spark.read.option("header", "true")
              .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
              .csv(path))
        return _positional(spark, df, cast=True)
    if ext in (".jsonl", ".json"):
        # newline-delimited JSON with the landing schema declared up
        # front: no schema inference pass over the data (at 100 TB the
        # inference scan would double the read), malformed rows fail
        # loudly instead of silently widening types
        df = (spark.read.schema(schemas.LANDING)
              .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
              .option("mode", "FAILFAST")
              .json(path))
        return df.select(*[f.name for f in schemas.LANDING.fields])
    # xlsx via the dependency-free lite reader (insert_from_excel.py:22
    # equivalent; handles the extracts' subset of xlsx — one sheet,
    # shared strings, numeric/date-serial cells)
    return _read_xlsx(spark, path)


def _read_xlsx(spark: SparkSession, path: str) -> DataFrame:
    from greenplum_dwh_spark.sources.xlsx_lite import (
        excel_serial_to_datetime, read_xlsx_rows)
    raw = read_xlsx_rows(path)[1:]  # drop header (mapping is positional)

    def _s(v):  # numeric-looking ids render as integer strings
        if isinstance(v, float):
            return str(int(v))
        return str(v)

    def _d(v):
        return excel_serial_to_datetime(v).date()

    records = []
    for r in raw:
        records.append((
            _s(r[0]), excel_serial_to_datetime(r[1]), _s(r[2]), _s(r[3]),
            _d(r[4]), _s(r[5]), _s(r[6]), _s(r[7]), _s(r[8]), _d(r[9]),
            _s(r[10]), _d(r[11]), _s(r[12]), _s(r[13]),
            decimal.Decimal(str(round(r[14], 2))), _s(r[15]), _s(r[16]),
            _s(r[17]), _s(r[18]), _s(r[19])))
    return spark.createDataFrame(records, schema=schemas.LANDING)


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
