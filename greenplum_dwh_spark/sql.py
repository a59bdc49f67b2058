"""SQL entry surface — temp-view registration so users can query the
warehouse and testdata with plain ``spark.sql`` (the way reference
users query Greenplum directly).

``register_warehouse`` exposes every warehouse table under its
reference name (fact_transactions, dim_*_hist, dim_*, report, landing);
``register_testdata`` exposes the TPC-H-ish tables. Views are zero-copy
over the underlying DataFrames, so Catalyst still prunes/pushes down
through them.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from greenplum_dwh_spark.sources.tpch import TABLE_NAMES, load_table
from greenplum_dwh_spark.warehouse import TABLES, Warehouse


def register_warehouse(wh: Warehouse, prefix: str = "") -> list[str]:
    names = []
    for name in TABLES:
        wh.read(name).createOrReplaceTempView(prefix + name)
        names.append(prefix + name)
    return names


def register_testdata(spark: SparkSession, sf_dir: str,
                      prefix: str = "") -> list[str]:
    names = []
    for name in TABLE_NAMES:
        try:
            load_table(spark, sf_dir, name) \
                .createOrReplaceTempView(prefix + name)
            names.append(prefix + name)
        except Exception:
            pass
    return names
