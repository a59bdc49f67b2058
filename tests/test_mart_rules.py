"""Golden tests for the fraud data mart over the 3-day fixture
(FIXTURES.md §3): exact seeded detections per rule, near-miss
exclusions, cumulative report growth, scd1-vs-scd2 branches."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from greenplum_dwh_spark import schemas
from greenplum_dwh_spark.etl import normalize_transactions
from greenplum_dwh_spark.mart import add_report_data
from greenplum_dwh_spark.mart.report import report_pivot
from greenplum_dwh_spark.sources import load_landing_file
from tests import bank_fixture as bf

RUN_TS = [dt.datetime(2020, 5, d + 1, 23, 0, 0) for d in range(1, 4)]


@pytest.fixture(scope="module")
def mart_wh(spark, tmp_path_factory):
    from greenplum_dwh_spark.warehouse import Warehouse
    root = tmp_path_factory.mktemp("mart")
    wh = Warehouse(spark, str(root / "wh"))
    paths = bf.write_extracts(spark, str(root / "extracts"))
    daily_report_rows = []
    for p, ts in zip(paths, RUN_TS):
        load_landing_file(wh, p)
        normalize_transactions(wh)
        n = add_report_data(wh, "scd2", run_ts=ts)
        daily_report_rows.append(n)
    return wh, daily_report_rows


def _frauds(wh, ftype, run_ts=None):
    df = wh.read("report").filter(F.col("fraud_type") == ftype)
    if run_ts is not None:
        df = df.filter(F.col("report_dt") == run_ts)
    return df


def test_rule1_expired_passport_last_day_only(mart_wh):
    wh, _ = mart_wh
    rows = _frauds(wh, schemas.FRAUD_EXPIRED_PASSPORT, RUN_TS[2]).collect()
    # C001 has exactly 2 background txns on day 3, all with expired passport
    assert len(rows) == 2
    assert {r["passport"] for r in rows} == {"4000000001"}
    assert all(r["fraud_dt"].date() == bf.DAYS[2] for r in rows)
    assert all(r["fio"] == "Фамилия1 Имя1 Отчество1" for r in rows)


def test_rule2_expired_account(mart_wh):
    wh, _ = mart_wh
    rows = _frauds(wh, schemas.FRAUD_EXPIRED_ACCOUNT, RUN_TS[2]).collect()
    # C010, C011: 2 background txns each on day 3
    assert len(rows) == 4
    assert {r["passport"] for r in rows} == {"4000000010", "4000000011"}


def test_rule3_city_hop_detected(mart_wh):
    wh, _ = mart_wh
    rows = _frauds(wh, schemas.FRAUD_CITY_HOP, RUN_TS[2]).collect()
    passports = {r["passport"] for r in rows}
    # C003's 12:30 hop flagged; C007's 90-min pair NOT flagged
    assert "4000000003" in passports
    assert "4000000007" not in passports
    hop = [r for r in rows if r["passport"] == "4000000003"]
    assert any(r["fraud_dt"] == dt.datetime(2020, 5, 3, 12, 30, 0)
               for r in hop)


def test_rule4_chains(mart_wh):
    wh, _ = mart_wh
    rows = _frauds(wh, schemas.FRAUD_AMOUNT_GUESS, RUN_TS[2]).collect()
    passports = {r["passport"] for r in rows}
    assert "4000000004" in passports          # full chain
    assert "4000000006" in passports          # midnight-crossing chain
    assert "4000000005" not in passports      # near-miss (2 declines)
    c4 = [r for r in rows if r["passport"] == "4000000004"]
    assert c4[0]["fraud_dt"] == dt.datetime(2020, 5, 3, 10, 15, 0)
    c6 = [r for r in rows if r["passport"] == "4000000006"]
    assert c6[0]["fraud_dt"] == dt.datetime(2020, 5, 3, 0, 3, 0)


def test_report_cumulative_growth(mart_wh):
    wh, daily = mart_wh
    assert all(n > 0 for n in daily)
    assert wh.read("report").count() == sum(daily)


def test_scd1_branch_agrees_on_last_day(mart_wh, spark, tmp_path):
    """scd1 and scd2 branches see identical current attributes here
    (no entity both changed and reverted), so day-3 runs must agree."""
    from greenplum_dwh_spark.warehouse import Warehouse
    wh2 = Warehouse(spark, str(tmp_path / "wh2"))
    for p, ts in zip(bf.write_extracts(spark, str(tmp_path / "ex")), RUN_TS):
        load_landing_file(wh2, p)
        normalize_transactions(wh2)
        add_report_data(wh2, "scd1", run_ts=ts)
    wh, _ = mart_wh
    a = (wh.read("report").filter(F.col("report_dt") == RUN_TS[2])
         .select("fraud_dt", "passport", "fraud_type"))
    b = (wh2.read("report").filter(F.col("report_dt") == RUN_TS[2])
         .select("fraud_dt", "passport", "fraud_type"))
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_report_pivot_shape(mart_wh):
    wh, _ = mart_wh
    pdf = report_pivot(wh.read("report")).toPandas()
    assert "fraud_date" in pdf.columns
    assert len(pdf) >= 1
    # at least the 4 fraud-type columns seeded across the 3 days
    assert len(pdf.columns) >= 4


def test_hour_diff_interval_field_quirk(spark):
    """Pin the Postgres date_part('hour', Δ) semantics: a pair 24h05m
    apart has interval hour-field 0 (day component excluded), so rule 3
    WOULD flag it — faithful to Data_mart.sql:291 (within the mart's
    25h staging window this can occur at the margins)."""
    import datetime as dt

    from greenplum_dwh_spark.mart.rules import rule_city_hop
    rows = [
        ("c1", dt.datetime(2020, 5, 1, 10, 0, 0), "A"),
        ("c1", dt.datetime(2020, 5, 2, 10, 5, 0), "B"),   # 24h05m → hour 0
        ("c2", dt.datetime(2020, 5, 1, 10, 0, 0), "A"),
        ("c2", dt.datetime(2020, 5, 1, 13, 5, 0), "B"),   # 3h05m → hour 3
    ]
    stg = spark.createDataFrame(
        [(c, ts, city, "p", "f", "+7") for c, ts, city in rows],
        "client string, trans_date timestamp, terminal_city string, "
        "passport_num string, fio string, phone string")
    got = rule_city_hop(stg, dt.datetime(2020, 5, 4)).collect()
    assert len(got) == 1
    assert got[0]["fraud_dt"] == dt.datetime(2020, 5, 2, 10, 5, 0)


def test_mart_rerun_appends_duplicates_faithfully(mart_wh, spark):
    """Re-running fn_add_report_data without new data appends the same
    fraud rows again (the report is append-only and cumulative,
    DDL.sql:155-169) — duplicates differ only in report_dt. Faithful
    reference semantics, documented by test."""
    wh, _ = mart_wh
    rerun_ts = dt.datetime(2020, 5, 5, 12, 0, 0)
    before = wh.read("report").count()
    n = add_report_data(wh, "scd2", run_ts=rerun_ts)
    assert n > 0
    assert wh.read("report").count() == before + n
    day3 = (wh.read("report").filter(F.col("report_dt") == RUN_TS[2])
            .select("fraud_dt", "passport", "fraud_type"))
    rerun = (wh.read("report").filter(F.col("report_dt") == rerun_ts)
             .select("fraud_dt", "passport", "fraud_type"))
    assert day3.exceptAll(rerun).count() == 0
    assert rerun.exceptAll(day3).count() == 0
