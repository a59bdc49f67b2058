"""Deterministic synthetic 3-day bank-transactions fixture.

Mirrors the reference's sample-data shape (FIXTURES.md §1): cumulative
daily extracts 2020-05-01..03 with seeded fraud patterns and SCD
changes so golden assertions are non-trivial:

- rule 1: client C001's passport expired 2019-12-31 (all their txns);
- rule 2: accounts of clients C010/C011 expired 2020-04-15;
- rule 3: client C003 makes two txns 30 min apart in different cities
  every day (plus one 90-min-apart near-miss pair for C007);
- rule 4: C004 full chain on day 3 (3 declines strictly decreasing,
  5 min apart, then success); C006 chain crossing midnight into day 3
  (declines 23:45/23:50/23:55 day 2, success 00:03 day 3 — cumulative
  in-chain seconds 1080 < 1200); C005 near-miss (2 declines only);
- SCD2/SCD1: terminal POS00005 changes address starting day 2; client
  C002 changes phone starting day 3.

Seed terminals (ids ≥ 100) carry fixed distinct cities so the city-hop
pattern never pollutes the regular terminal pool's SCD history.
"""

from __future__ import annotations

import datetime as dt
import random
from decimal import Decimal

import pandas as pd

DAY1 = dt.date(2020, 5, 1)
DAYS = [DAY1, dt.date(2020, 5, 2), dt.date(2020, 5, 3)]

N_CLIENTS = 30
N_TERMINALS = 12
CITIES = ["Москва", "Казань", "Тверь", "Самара", "Пермь", "Омск", "Уфа"]

SUCCESS, DECLINED = "Успешно", "Отказ"
OPS = ["Пополнение", "Снятие", "Оплата"]

SCD2_TERMINAL = "POS00005"
SCD_CLIENT = "C002"
NEW_PHONE = "+79001112233"


def _client(i: int, day: dt.date) -> dict:
    cid = f"C{i:03d}"
    phone = f"+7900000{i:04d}"
    if cid == SCD_CLIENT and day >= DAYS[2]:
        phone = NEW_PHONE
    return {
        "client": cid,
        "last_name": f"Фамилия{i}",
        "first_name": f"Имя{i}",
        "patronymic": f"Отчество{i}",
        "date_of_birth": dt.date(1960 + i % 40, 1 + i % 12, 1 + i % 28),
        "passport_num": f"{4000000000 + i}",
        "passport_valid_to": (dt.date(2019, 12, 31) if i == 1
                              else dt.date(2030, 1, 1)),
        "phone": phone,
    }


def _terminal(i: int, day: dt.date) -> dict:
    tid = f"{'POS' if i % 2 else 'ATM'}{i:05d}"
    city = CITIES[i % len(CITIES)]
    addr_v = 2 if (tid == SCD2_TERMINAL and day >= DAYS[1]) else 1
    return {"terminal": tid, "terminal_type": "POS" if i % 2 else "ATM",
            "city": city, "address": f"{city}, ул. Тестовая, д. {i}{addr_v}"}


def generate_day_rows(day: dt.date, rng: random.Random,
                      id_start: int) -> list[dict]:
    rows = []
    tid_counter = [id_start]

    def emit(i_client: int, hh: int, mm: int, ss: int, result: str,
             amount: str | None = None, term_i: int | None = None):
        c = _client(i_client, day)
        term = _terminal(term_i if term_i is not None
                         else rng.randrange(N_TERMINALS), day)
        acct_expired = i_client in (10, 11)
        amt = (Decimal(amount) if amount is not None else
               Decimal(f"{rng.randrange(100, 99000)}.{rng.randrange(100):02d}"))
        rows.append({
            "trans_id": str(900000000 + tid_counter[0]),
            "trans_date": dt.datetime.combine(day, dt.time(hh, mm, ss)),
            "card_num": f"{5000000000000000000 + i_client}",
            "account_num": f"{4081781000000000000 + i_client}",
            "account_valid_to": (dt.date(2020, 4, 15) if acct_expired
                                 else dt.date(2030, 1, 1)),
            **{k: c[k] for k in ("client", "last_name", "first_name",
                                 "patronymic", "date_of_birth",
                                 "passport_num", "passport_valid_to",
                                 "phone")},
            "oper_type": rng.choice(OPS),
            "amount": amt,
            "oper_result": result,
            **{k: term[k] for k in ("terminal", "terminal_type", "city",
                                    "address")},
        })
        tid_counter[0] += 1

    # background traffic: each client 2 txns spread over the day
    for i in range(1, N_CLIENTS + 1):
        for j in range(2):
            emit(i, (3 + 7 * j + i) % 20, (i * 7 + j * 13) % 60, i % 60,
                 SUCCESS if rng.random() < 0.8 else DECLINED)
    # guarantee the SCD2 terminal appears every day (so its day-2
    # address change versions deterministically); 21:00 is ≥2h from
    # C008's background rows so it can never seed a city hop
    emit(8, 21, 0, 0, SUCCESS, term_i=5)
    # rule 3: C003 city hop, 30 min apart, dedicated seed terminals with
    # distinct fixed cities (100 -> Тверь, 101 -> Самара)
    emit(3, 12, 0, 0, SUCCESS, term_i=100)
    emit(3, 12, 30, 0, SUCCESS, term_i=101)
    # near-miss city pair for C007: 90 min apart (hour field = 1)
    emit(7, 14, 0, 0, SUCCESS, term_i=102)
    emit(7, 15, 30, 0, SUCCESS, term_i=103)
    if day == DAYS[1]:
        # rule 4 midnight chain: declines end of day 2
        emit(6, 23, 45, 0, DECLINED, "9900.00")
        emit(6, 23, 50, 0, DECLINED, "9800.00")
        emit(6, 23, 55, 0, DECLINED, "9700.00")
    if day == DAYS[2]:
        # rule 4 full chain: C004
        emit(4, 10, 0, 0, DECLINED, "9000.00")
        emit(4, 10, 5, 0, DECLINED, "8000.00")
        emit(4, 10, 10, 0, DECLINED, "7000.00")
        emit(4, 10, 15, 0, SUCCESS, "6500.00")
        # rule 4 near-miss: C005 only 2 declines
        emit(5, 11, 0, 0, DECLINED, "5000.00")
        emit(5, 11, 5, 0, DECLINED, "4000.00")
        emit(5, 11, 10, 0, SUCCESS, "3500.00")
        # midnight chain success
        emit(6, 0, 3, 0, SUCCESS, "9650.00")
    return rows


def generate_extracts() -> dict[dt.date, pd.DataFrame]:
    """Cumulative daily extracts: file for day N holds days 1..N."""
    per_day = {}
    for n, day in enumerate(DAYS):
        rng = random.Random(42 + day.day)
        per_day[day] = generate_day_rows(day, rng, n * 10000)
    out, acc = {}, []
    for day in DAYS:
        acc = acc + per_day[day]
        out[day] = pd.DataFrame(acc)
    return out


def write_extracts(spark, out_dir: str) -> list[str]:
    """Write the cumulative extracts as parquet landing files."""
    import os

    from greenplum_dwh_spark import schemas
    paths = []
    for day, pdf in generate_extracts().items():
        path = os.path.join(out_dir, f"transactions_{day.isoformat()}.parquet")
        spark.createDataFrame(pdf, schema=schemas.LANDING) \
             .coalesce(1).write.mode("overwrite").parquet(path)
        paths.append(path)
    return paths
