"""Pure-pandas unit tests for the rule-4 state machine — one test per
transition branch of fn_find_summ_frauds (Data_mart.sql:49-97), no
Spark needed."""

from __future__ import annotations

import datetime as dt
from decimal import Decimal

import pandas as pd
import pytest

from greenplum_dwh_spark.mart.chains import detect_chains_pd
from greenplum_dwh_spark.schemas import (FRAUD_AMOUNT_GUESS,
                                         RESULT_DECLINED, RESULT_SUCCESS)

T0 = dt.datetime(2020, 5, 3, 10, 0, 0)
RUN = dt.datetime(2020, 5, 4, 0, 0, 0)


COLS = ["trans_date", "amount", "oper_result", "passport_num", "fio",
        "phone"]


def mk(rows):
    return pd.DataFrame(
        [{"trans_date": T0 + dt.timedelta(seconds=s),
          "amount": Decimal(a), "oper_result": r,
          "passport_num": "400", "fio": "F I O", "phone": "+7"}
         for s, a, r in rows], columns=COLS)


def run(rows):
    return detect_chains_pd(mk(rows), RUN)


def test_basic_chain_flags_success():
    out = run([(0, "900", RESULT_DECLINED), (300, "800", RESULT_DECLINED),
               (600, "700", RESULT_DECLINED), (900, "650", RESULT_SUCCESS)])
    assert len(out) == 1
    assert out.iloc[0]["fraud_type"] == FRAUD_AMOUNT_GUESS
    assert out.iloc[0]["fraud_dt"] == T0 + dt.timedelta(seconds=900)
    assert out.iloc[0]["report_dt"] == RUN


def test_only_two_declines_not_flagged():
    out = run([(0, "900", RESULT_DECLINED), (300, "800", RESULT_DECLINED),
               (600, "650", RESULT_SUCCESS)])
    assert len(out) == 0


def test_non_decreasing_amount_restarts_chain():
    # 3rd decline raises the amount -> chain restarts there (:89-92)
    out = run([(0, "900", RESULT_DECLINED), (300, "800", RESULT_DECLINED),
               (600, "850", RESULT_DECLINED), (900, "650", RESULT_SUCCESS)])
    assert len(out) == 0


def test_equal_amount_restarts_chain():
    out = run([(0, "900", RESULT_DECLINED), (300, "900", RESULT_DECLINED),
               (600, "800", RESULT_DECLINED), (900, "650", RESULT_SUCCESS)])
    assert len(out) == 0


def test_time_budget_exceeded_restarts():
    # cumulative in-chain seconds reach 1200 before the success (:75,:89)
    out = run([(0, "900", RESULT_DECLINED), (600, "800", RESULT_DECLINED),
               (1200, "700", RESULT_DECLINED), (1250, "650", RESULT_SUCCESS)])
    assert len(out) == 0


def test_budget_exactly_1199_flags():
    out = run([(0, "900", RESULT_DECLINED), (400, "800", RESULT_DECLINED),
               (800, "700", RESULT_DECLINED), (1199, "650", RESULT_SUCCESS)])
    assert len(out) == 1


def test_four_declines_then_success_flags():
    out = run([(0, "900", RESULT_DECLINED), (200, "850", RESULT_DECLINED),
               (400, "800", RESULT_DECLINED), (600, "750", RESULT_DECLINED),
               (800, "650", RESULT_SUCCESS)])
    assert len(out) == 1


def test_success_resets_then_new_chain():
    out = run([(0, "500", RESULT_SUCCESS),
               (100, "900", RESULT_DECLINED), (200, "800", RESULT_DECLINED),
               (300, "700", RESULT_DECLINED), (400, "650", RESULT_SUCCESS)])
    assert len(out) == 1


def test_two_chains_same_client():
    out = run([(0, "900", RESULT_DECLINED), (100, "800", RESULT_DECLINED),
               (200, "700", RESULT_DECLINED), (300, "650", RESULT_SUCCESS),
               (1000, "500", RESULT_DECLINED), (1100, "400", RESULT_DECLINED),
               (1200, "300", RESULT_DECLINED), (1300, "250", RESULT_SUCCESS)])
    assert len(out) == 2


def test_decline_after_flagged_success_starts_fresh_chain():
    # zero_on_prev + declined -> counter=1 (:51-54)
    out = run([(0, "900", RESULT_DECLINED), (100, "800", RESULT_DECLINED),
               (200, "700", RESULT_DECLINED), (300, "650", RESULT_SUCCESS),
               (400, "600", RESULT_DECLINED), (500, "650", RESULT_SUCCESS)])
    assert len(out) == 1


def test_midnight_crossing_chain():
    base = dt.datetime(2020, 5, 2, 23, 45, 0)
    pdf = pd.DataFrame(
        [{"trans_date": base + dt.timedelta(seconds=s),
          "amount": Decimal(a), "oper_result": r,
          "passport_num": "400", "fio": "F", "phone": "+7"}
         for s, a, r in [(0, "9900", RESULT_DECLINED),
                         (300, "9800", RESULT_DECLINED),
                         (600, "9700", RESULT_DECLINED),
                         (1080, "9650", RESULT_SUCCESS)]])
    out = detect_chains_pd(pdf, RUN)
    assert len(out) == 1
    assert out.iloc[0]["fraud_dt"].to_pydatetime() == dt.datetime(2020, 5, 3, 0, 3, 0)


def test_empty_input():
    out = run([])
    assert len(out) == 0
