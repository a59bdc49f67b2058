"""§2.10: the engine's user-extension mechanism is the standard PySpark
UDF surface (the reference's PL/pgSQL functions map to driver-side
Python + applyInPandas; *user-defined* scalar logic maps to F.udf /
pandas_udf, registered for both DataFrame and SQL use)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from greenplum_dwh_spark.sources.tpch import Tables


def test_row_udf_registration_and_sql_use(spark, sf_dir):
    from greenplum_dwh_spark.shipping import ensure_shipped
    ensure_shipped(spark)

    @F.udf(returnType=T.StringType())
    def mask_name(name: str) -> str:
        return name[:2] + "***" if name else name

    spark.udf.register("mask_name_sql", lambda s: s[:2] + "***",
                       T.StringType())
    t = Tables(spark, sf_dir)
    df_api = t.customer.select(mask_name("c_name").alias("m")).limit(5)
    t.customer.createOrReplaceTempView("_cust_udf")
    df_sql = spark.sql(
        "SELECT mask_name_sql(c_name) AS m FROM _cust_udf LIMIT 5")
    for r in df_api.collect() + df_sql.collect():
        assert r["m"].endswith("***")


def test_pandas_udf_vectorized(spark, sf_dir):
    from greenplum_dwh_spark.shipping import ensure_shipped
    ensure_shipped(spark)

    @F.pandas_udf(T.DoubleType())
    def zscore(v: pd.Series) -> pd.Series:
        return (v - v.mean()) / v.std()

    t = Tables(spark, sf_dir)
    out = (t.lineitem.limit(1000)
           .select(zscore("l_extendedprice").alias("z")))
    rows = out.collect()
    assert len(rows) == 1000
    assert all(r["z"] is not None for r in rows)
    # vectorized (Arrow) execution, not row-at-a-time
    from greenplum_dwh_spark.plans import checks
    assert "ArrowEvalPython" in checks.physical_plan(out)
