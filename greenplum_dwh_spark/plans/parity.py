"""Local replica of the driver's DuckDB-oracle correctness gate.

Runs a Spark query and its oracle SQL side-by-side, normalizes both
result sets (columns sorted by name, rows sorted by all columns,
timestamps/decimals stringified) and compares exactly — stricter than
a value-hash: on mismatch it reports the first differing rows instead
of just a hash diff.
"""

from __future__ import annotations

import datetime as dt
import decimal
import math
import os

import pandas as pd


def _norm_cell(v):
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "<NULL>"
    if isinstance(v, float):
        return repr(v)  # full precision — bit-exact comparison
    if isinstance(v, decimal.Decimal):
        return repr(float(v))
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if isinstance(v, (dt.datetime, dt.date)):
        return v.isoformat()
    return str(v)


def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        pdf[c] = pdf[c].map(_norm_cell)
    pdf = pdf.sort_values(list(pdf.columns), kind="mergesort")
    return pdf.reset_index(drop=True)


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    import duckdb
    con = duckdb.connect()
    try:
        for name in ("region", "nation", "customer", "supplier", "part",
                     "orders", "lineitem", "events", "documents",
                     "embeddings"):
            path = os.path.join(sf_dir, f"{name}.parquet")
            if os.path.exists(path):
                con.execute(
                    f"CREATE VIEW {name} AS "
                    f"SELECT * FROM read_parquet('{path}')")
        return con.execute(sql).fetchdf()
    finally:
        con.close()


def compare(spark_df, oracle_sql: str, sf_dir: str) -> dict:
    left = normalize(spark_df.toPandas())
    right = normalize(run_oracle(oracle_sql, sf_dir))
    result = {"rows_spark": len(left), "rows_oracle": len(right),
              "cols_spark": list(left.columns),
              "cols_oracle": list(right.columns), "ok": False,
              "detail": ""}
    if list(left.columns) != list(right.columns):
        result["detail"] = "column mismatch"
        return result
    if len(left) != len(right):
        result["detail"] = "row count mismatch"
        return result
    neq = (left.values != right.values)
    if neq.any():
        idx = neq.any(axis=1).argmax()
        result["detail"] = (f"first diff at sorted row {idx}: "
                            f"spark={left.iloc[idx].to_dict()} "
                            f"oracle={right.iloc[idx].to_dict()}")
        return result
    result["ok"] = True
    return result
