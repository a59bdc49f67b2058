"""End-to-end ETL tests: 3 cumulative daily loads → normalize, asserting
SCD2 versioning, SCD1 overwrite semantics, fact append/partitioning,
and landing truncation (FIXTURES.md §3)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from greenplum_dwh_spark.etl import normalize_transactions
from greenplum_dwh_spark.sources import load_landing_file
from tests import bank_fixture as bf


@pytest.fixture(scope="module")
def loaded_wh(spark, tmp_path_factory):
    from greenplum_dwh_spark.warehouse import Warehouse
    root = tmp_path_factory.mktemp("etl")
    wh = Warehouse(spark, str(root / "wh"))
    paths = bf.write_extracts(spark, str(root / "extracts"))
    per_day_counts = []
    for p in paths:
        n = load_landing_file(wh, p)
        per_day_counts.append(n)
        normalize_transactions(wh)
    return wh, per_day_counts


def test_last_day_filter_loads_only_new_day(loaded_wh):
    _, counts = loaded_wh
    extracts = bf.generate_extracts()
    for day, n in zip(bf.DAYS, counts):
        pdf = extracts[day]
        expected = (pdf["trans_date"].dt.date == day).sum()
        assert n == expected


def test_fact_appends_all_days(loaded_wh):
    wh, counts = loaded_wh
    fact = wh.read("fact_transactions")
    assert fact.count() == sum(counts)
    days = [r["trans_dt_day"] for r in
            fact.select("trans_dt_day").distinct().collect()]
    assert sorted(days) == bf.DAYS


def test_landing_truncated_after_etl(loaded_wh):
    wh, _ = loaded_wh
    assert wh.read("landing").count() == 0


def test_scd2_terminal_versioning(loaded_wh):
    wh, _ = loaded_wh
    hist = (wh.read("dim_terminals_hist")
            .filter(F.col("terminal_id") == bf.SCD2_TERMINAL)
            .orderBy("start_dt").collect())
    assert len(hist) == 2
    old, new = hist
    assert old["terminal_address"].endswith("51")
    assert new["terminal_address"].endswith("52")
    # close-out: old version's end_dt = new version's start_dt
    assert old["end_dt"] == new["start_dt"]
    assert new["end_dt"] is None
    # start_dt is the min trans_date of the version, not ETL time
    assert old["start_dt"].date() == bf.DAYS[0]
    assert new["start_dt"].date() == bf.DAYS[1]


def test_scd2_client_phone_versioning(loaded_wh):
    wh, _ = loaded_wh
    hist = (wh.read("dim_clients_hist")
            .filter(F.col("client_id") == bf.SCD_CLIENT)
            .orderBy("start_dt").collect())
    assert len(hist) == 2
    assert hist[0]["end_dt"] == hist[1]["start_dt"]
    assert hist[1]["phone"] == bf.NEW_PHONE
    assert hist[1]["end_dt"] is None


def test_scd2_unchanged_entity_single_open_version(loaded_wh):
    wh, _ = loaded_wh
    hist = (wh.read("dim_clients_hist")
            .filter(F.col("client_id") == "C009").collect())
    assert len(hist) == 1
    assert hist[0]["end_dt"] is None


def test_scd1_overwrite_and_update_dt(loaded_wh):
    wh, _ = loaded_wh
    row = (wh.read("dim_clients")
           .filter(F.col("client_id") == bf.SCD_CLIENT).collect())
    assert len(row) == 1
    assert row[0]["phone"] == bf.NEW_PHONE
    # updated on day-3 batch: update_dt = that batch's create_dt
    assert row[0]["update_dt"] is not None
    assert row[0]["update_dt"].date() == bf.DAYS[2]
    assert row[0]["create_dt"].date() == bf.DAYS[0]


def test_scd1_never_updated_has_null_update_dt(loaded_wh):
    wh, _ = loaded_wh
    row = (wh.read("dim_clients")
           .filter(F.col("client_id") == "C009").collect())
    assert len(row) == 1
    assert row[0]["update_dt"] is None


def test_scd1_terminal_address_overwritten(loaded_wh):
    wh, _ = loaded_wh
    row = (wh.read("dim_terminals")
           .filter(F.col("terminal_id") == bf.SCD2_TERMINAL).collect())
    assert len(row) == 1
    assert row[0]["terminal_address"].endswith("52")
    assert row[0]["update_dt"] is not None


def test_dims_one_row_per_entity(loaded_wh):
    wh, _ = loaded_wh
    for name, key in [("dim_clients", "client_id"), ("dim_cards", "card_num"),
                      ("dim_accounts", "account_num"),
                      ("dim_terminals", "terminal_id")]:
        dim = wh.read(name)
        assert dim.count() == dim.select(key).distinct().count(), name


def test_rerun_normalize_on_empty_landing_is_noop(loaded_wh, spark):
    wh, _ = loaded_wh
    before = {n: wh.read(n).count()
              for n in ("fact_transactions", "dim_clients_hist")}
    normalize_transactions(wh)
    after = {n: wh.read(n).count()
             for n in ("fact_transactions", "dim_clients_hist")}
    assert before == after
