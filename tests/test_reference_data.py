"""The credential test: run the REFERENCE'S OWN sample data
(/root/reference/data/transactions_0{1,2,3}052020.xlsx, read-only)
through the full pipeline and reproduce the ground-truth statistics
measured directly from those files (SURVEY.md §0, corrected):

- 808/826/830 rows loaded per day, 2,464 fact rows after 3 loads;
- 100 clients / 100 terminals / 2,185 cards (1:1 with accounts);
- rule 1: 20 expired-passport frauds, all one client (its passport
  expires 2020-05-02 mid-range, so day-2 rows past midnight qualify
  under the strict ``>`` + date→midnight promotion, like Postgres);
- rule 2: 26 expired-account-labeled frauds across 20 clients (29 rows
  satisfy the raw condition; 3 also have the expired passport and take
  the passport label via the CASE precedence, Data_mart.sql:265-268);
- rule 4: ≥2 amount-guessing chains;
- SCD2 versioning exercised: exactly 1 terminal (ATM90761) and 1
  client (3-58577) carry a closed historical version.
"""

from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F

from greenplum_dwh_spark import schemas
from greenplum_dwh_spark.etl import normalize_transactions
from greenplum_dwh_spark.mart import add_report_data
from greenplum_dwh_spark.sources import load_landing_file

REF_DATA = "/root/reference/data"
FILES = [f"transactions_0{i}052020.xlsx" for i in (1, 2, 3)]
RUN_TS = [dt.datetime(2020, 5, d, 23, 59, 0) for d in (1, 2, 3)]

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_DATA), reason="reference data not present")


@pytest.fixture(scope="module")
def ref_wh(spark, tmp_path_factory):
    from greenplum_dwh_spark.warehouse import Warehouse
    wh = Warehouse(spark, str(tmp_path_factory.mktemp("refwh") / "wh"))
    loaded = []
    for f, ts in zip(FILES, RUN_TS):
        loaded.append(load_landing_file(wh, os.path.join(REF_DATA, f)))
        normalize_transactions(wh)
        add_report_data(wh, "scd2", run_ts=ts)
    return wh, loaded


def test_daily_row_counts_and_fact_total(ref_wh):
    wh, loaded = ref_wh
    assert loaded == [808, 826, 830]
    assert wh.read("fact_transactions").count() == 2464


def test_entity_cardinalities(ref_wh):
    wh, _ = ref_wh
    assert wh.read("dim_clients").count() == 100
    assert wh.read("dim_terminals").count() == 100
    assert wh.read("dim_cards").count() == 2185
    assert wh.read("dim_accounts").count() == 2185  # 1:1 with cards


def test_rule1_twenty_expired_passport_frauds_one_client(ref_wh):
    wh, _ = ref_wh
    r1 = (wh.read("report")
          .filter(F.col("fraud_type") == schemas.FRAUD_EXPIRED_PASSPORT))
    assert r1.count() == 20
    assert r1.select("passport").distinct().count() == 1


def test_rule2_26_expired_account_labels_20_clients(ref_wh):
    wh, _ = ref_wh
    r2 = (wh.read("report")
          .filter(F.col("fraud_type") == schemas.FRAUD_EXPIRED_ACCOUNT))
    assert r2.count() == 26
    assert r2.select("passport").distinct().count() == 20


def test_rule3_city_hops_detected(ref_wh):
    wh, _ = ref_wh
    r3 = (wh.read("report")
          .filter(F.col("fraud_type") == schemas.FRAUD_CITY_HOP))
    assert r3.count() > 500  # abundant in the sample data (SURVEY §5)


def test_rule4_chains_detected(ref_wh):
    wh, _ = ref_wh
    r4 = (wh.read("report")
          .filter(F.col("fraud_type") == schemas.FRAUD_AMOUNT_GUESS))
    assert r4.count() >= 2


def test_scd2_exactly_one_terminal_and_one_client_versioned(ref_wh):
    wh, _ = ref_wh
    closed_terms = (wh.read("dim_terminals_hist")
                    .filter(F.col("end_dt").isNotNull()))
    closed_clients = (wh.read("dim_clients_hist")
                      .filter(F.col("end_dt").isNotNull()))
    assert closed_terms.count() == 1
    assert closed_clients.count() == 1
    assert closed_terms.first()["terminal_id"] == "ATM90761"
    assert closed_clients.first()["client_id"] == "3-58577"
    assert wh.read("dim_terminals_hist").count() == 101
    assert wh.read("dim_clients_hist").count() == 101


def test_scd1_branch_agrees_on_reference_data(ref_wh):
    """fn_add_report_data('scd1') vs 'scd2' on the real data: current
    attribute values coincide (the one changed client/terminal has its
    latest attrs in both), so a day-3 rerun must produce identical
    fraud rows."""
    wh, _ = ref_wh
    extra_ts = dt.datetime(2020, 5, 3, 23, 59, 30)
    add_report_data(wh, "scd1", run_ts=extra_ts)
    scd1_rows = (wh.read("report")
                 .filter(F.col("report_dt") == extra_ts)
                 .select("fraud_dt", "passport", "fraud_type"))
    scd2_rows = (wh.read("report")
                 .filter(F.col("report_dt") == RUN_TS[2])
                 .select("fraud_dt", "passport", "fraud_type"))
    assert scd1_rows.exceptAll(scd2_rows).count() == 0
    assert scd2_rows.exceptAll(scd1_rows).count() == 0
