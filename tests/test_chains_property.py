"""Property-based equivalence: the per-client parallel state machine
(mart/chains.py) must emit exactly what a direct transliteration of the
reference's GLOBAL cursor loop (fn_find_summ_frauds, Data_mart.sql:
2-106 — single pass over rows ordered by client, fraud_dt, with state
carried across client boundaries) emits. This is the key parallelism-
safety claim behind replacing the master-side cursor with
groupBy(client).applyInPandas."""

from __future__ import annotations

import datetime as dt
from decimal import Decimal

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from greenplum_dwh_spark.mart.chains import detect_chains_pd
from greenplum_dwh_spark.schemas import RESULT_DECLINED, RESULT_SUCCESS

T0 = dt.datetime(2020, 5, 3, 0, 0, 0)
RUN = dt.datetime(2020, 5, 4)


def reference_global_loop(rows: pd.DataFrame, min_declines=3,
                          sec_budget=1200) -> list:
    """Direct transliteration of the plpgsql loop: ONE pass over all
    clients ordered by (client, fraud_dt); lag diffs computed per
    client partition (the CTE's PARTITION BY client); state variables
    global, reset on client change exactly as Data_mart.sql:49-97."""
    out = []
    counter, zero_on_prev, sec_count = 0, False, 0
    if rows.empty:
        return out
    cur_client = rows["client"].min()  # :17
    rows = rows.sort_values(["client", "trans_date"], kind="mergesort")
    # lag() within client partition (:30-31)
    rows = rows.assign(
        lagamt=rows.groupby("client")["amount"].shift(1),
        lagts=rows.groupby("client")["trans_date"].shift(1))
    for z in rows.itertuples(index=False):
        amount_diff = (Decimal(-1) if pd.isna(z.lagamt)
                       else z.amount - z.lagamt)
        if pd.isna(z.lagts):
            sec_diff = 0
        else:
            sec_diff = int((z.trans_date - z.lagts)
                           .total_seconds()) % 86400
        if zero_on_prev and z.oper_result == RESULT_DECLINED:  # :51
            counter, cur_client, zero_on_prev = 1, z.client, False
        elif zero_on_prev and z.oper_result == RESULT_SUCCESS:  # :56
            sec_count, counter, cur_client = 0, 0, z.client
            zero_on_prev = True
        elif not zero_on_prev:
            sec_count += sec_diff                               # :63
            if z.client != cur_client:                          # :65
                cur_client, sec_count = z.client, 0
                if z.oper_result == RESULT_DECLINED:
                    counter = 1
                elif z.oper_result == RESULT_SUCCESS:
                    counter, zero_on_prev = 0, True
            elif (counter >= min_declines
                  and z.oper_result == RESULT_SUCCESS
                  and sec_count < sec_budget):                  # :75
                out.append((z.client, z.trans_date))
                counter, sec_count, zero_on_prev = 0, 0, True
            elif z.oper_result == RESULT_SUCCESS:               # :84
                counter, sec_count, zero_on_prev = 0, 0, True
            elif amount_diff >= 0 or sec_count >= sec_budget:   # :89
                counter, sec_count, zero_on_prev = 1, 0, False
            elif (amount_diff < 0 and sec_count < sec_budget
                  and z.oper_result == RESULT_DECLINED):        # :94
                counter, zero_on_prev = counter + 1, False
    return sorted(out)


@st.composite
def client_rows(draw):
    n_clients = draw(st.integers(1, 4))
    rows = []
    for c in range(n_clients):
        n = draw(st.integers(0, 12))
        # strictly increasing per-client timestamps (no ties, like the
        # reference's unique trans_date per client ordering)
        gaps = draw(st.lists(st.integers(1, 2000), min_size=n, max_size=n))
        t = T0
        for g in gaps:
            t = t + dt.timedelta(seconds=g)
            rows.append({
                "client": f"C{c}",
                "trans_date": t,
                "amount": Decimal(draw(st.integers(1, 8)) * 100),
                "oper_result": draw(st.sampled_from(
                    [RESULT_DECLINED, RESULT_DECLINED, RESULT_SUCCESS])),
                "passport_num": f"P{c}", "fio": f"F{c}", "phone": f"+{c}",
            })
    return pd.DataFrame(rows, columns=["client", "trans_date", "amount",
                                       "oper_result", "passport_num",
                                       "fio", "phone"])


@given(client_rows())
@settings(max_examples=300, deadline=None)
def test_per_client_machine_equals_global_cursor(rows):
    expected = reference_global_loop(rows)
    got = []
    if not rows.empty:
        for client, grp in rows.groupby("client"):
            out = detect_chains_pd(grp, RUN)
            got.extend((client, ts.to_pydatetime()
                        if hasattr(ts, "to_pydatetime") else ts)
                       for ts in out["fraud_dt"])
    assert sorted(got) == expected
