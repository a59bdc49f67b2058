"""Users must be able to run plain SQL against the warehouse and
testdata views — the reference's direct-SQL usage mode."""

from __future__ import annotations

import pytest

from greenplum_dwh_spark.sql import register_testdata, register_warehouse


def test_sql_over_testdata_views(spark, sf_dir):
    names = register_testdata(spark, sf_dir)
    assert "lineitem" in names and "events" in names
    row = spark.sql("""
        SELECT l_returnflag, count(*) AS n
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """).collect()
    assert [r["l_returnflag"] for r in row] == ["A", "N", "R"]


def test_sql_over_warehouse_views(spark, tmp_path):
    from greenplum_dwh_spark.etl import normalize_transactions
    from greenplum_dwh_spark.sources import load_landing_file
    from greenplum_dwh_spark.warehouse import Warehouse
    from tests import bank_fixture as bf
    wh = Warehouse(spark, str(tmp_path / "wh"))
    paths = bf.write_extracts(spark, str(tmp_path / "ex"))
    load_landing_file(wh, paths[0])
    normalize_transactions(wh)
    register_warehouse(wh)
    # the mart staging join, written as the reference user would
    got = spark.sql("""
        SELECT count(*) AS n
        FROM fact_transactions ft
        JOIN dim_cards_hist c ON c.card_num = ft.card_num
                             AND c.end_dt IS NULL
        JOIN dim_accounts_hist a ON a.account_num = c.account_num
                                AND a.end_dt IS NULL
        JOIN dim_clients_hist cl ON cl.client_id = a.client
                                AND cl.end_dt IS NULL
    """).collect()[0]["n"]
    assert got == wh.read("fact_transactions").count()
    # SQL sees partition pruning too
    pruned = spark.sql(
        "SELECT count(*) AS n FROM fact_transactions "
        "WHERE trans_dt_day = DATE'2020-05-01'").collect()[0]["n"]
    assert pruned == got
