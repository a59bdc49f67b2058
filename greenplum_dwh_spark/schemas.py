"""Declared schemas for every table of the warehouse.

Schema-on-write, never inferred (the reference declares full DDL,
sql_scripts/DDL.sql:15-169; the Excel loader maps columns positionally,
python_scripts/insert_from_excel.py:30-38).

Type mapping (SURVEY.md §1.2): text→string, timestamp→timestamp (naive,
session tz = UTC), date→date, numeric→decimal(18,2).

Note the reference's own misspelling ``patrinymic`` (DDL.sql:24,100,144)
is *not* carried over; we use ``patronymic`` everywhere and map
positionally at ingest like the reference does.
"""

from __future__ import annotations

from pyspark.sql import types as T

_dec = T.DecimalType(18, 2)


def _schema(*cols: tuple) -> T.StructType:
    return T.StructType([T.StructField(n, t, nullable=nl) for n, t, nl in cols])


#: Landing table — 1 row per raw transaction, 20 denormalized columns
#: (DDL.sql:15-40; column order mirrors the Excel extract header).
LANDING = _schema(
    ("trans_id", T.StringType(), False),
    ("trans_date", T.TimestampType(), False),
    ("card_num", T.StringType(), False),
    ("account_num", T.StringType(), False),
    ("account_valid_to", T.DateType(), False),
    ("client", T.StringType(), False),
    ("last_name", T.StringType(), False),
    ("first_name", T.StringType(), False),
    ("patronymic", T.StringType(), False),
    ("date_of_birth", T.DateType(), False),
    ("passport_num", T.StringType(), False),
    ("passport_valid_to", T.DateType(), False),
    ("phone", T.StringType(), False),
    ("oper_type", T.StringType(), False),
    ("amount", _dec, False),
    ("oper_result", T.StringType(), False),
    ("terminal", T.StringType(), False),
    ("terminal_type", T.StringType(), False),
    ("city", T.StringType(), False),
    ("address", T.StringType(), False),
)

#: Fact — 1 row per transaction (DDL.sql:44-67), partitioned by day on
#: write (mirrors PARTITION BY RANGE(trans_date) EVERY '1 day').
FACT_TRANSACTIONS = _schema(
    ("trans_id", T.StringType(), False),
    ("trans_date", T.TimestampType(), False),
    ("card_num", T.StringType(), False),
    ("oper_type", T.StringType(), False),
    ("amt", _dec, False),
    ("oper_result", T.StringType(), False),
    ("terminal", T.StringType(), False),
)

# ---- SCD2 dimensions (DDL.sql:71-110): start_dt/end_dt validity,
#      open row has end_dt IS NULL.
_SCD2_TAIL = (("start_dt", T.TimestampType(), False),
              ("end_dt", T.TimestampType(), True))

DIM_TERMINALS_HIST = _schema(
    ("terminal_id", T.StringType(), False),
    ("terminal_type", T.StringType(), False),
    ("terminal_city", T.StringType(), False),
    ("terminal_address", T.StringType(), False),
    *_SCD2_TAIL,
)

DIM_CARDS_HIST = _schema(
    ("card_num", T.StringType(), False),
    ("account_num", T.StringType(), False),
    *_SCD2_TAIL,
)

DIM_ACCOUNTS_HIST = _schema(
    ("account_num", T.StringType(), False),
    ("valid_to", T.DateType(), False),
    ("client", T.StringType(), False),
    *_SCD2_TAIL,
)

DIM_CLIENTS_HIST = _schema(
    ("client_id", T.StringType(), False),
    ("last_name", T.StringType(), False),
    ("first_name", T.StringType(), False),
    ("patronymic", T.StringType(), False),
    ("date_of_birth", T.DateType(), False),
    ("passport_num", T.StringType(), False),
    ("passport_valid_to", T.DateType(), False),
    ("phone", T.StringType(), False),
    *_SCD2_TAIL,
)

# ---- SCD1 dimensions (DDL.sql:113-152): create_dt/update_dt,
#      update_dt NULL = never updated (ETL.sql:256-260).
_SCD1_TAIL = (("create_dt", T.TimestampType(), False),
              ("update_dt", T.TimestampType(), True))

DIM_TERMINALS = _schema(
    ("terminal_id", T.StringType(), False),
    ("terminal_type", T.StringType(), False),
    ("terminal_city", T.StringType(), False),
    ("terminal_address", T.StringType(), False),
    *_SCD1_TAIL,
)

DIM_CARDS = _schema(
    ("card_num", T.StringType(), False),
    ("account_num", T.StringType(), False),
    *_SCD1_TAIL,
)

DIM_ACCOUNTS = _schema(
    ("account_num", T.StringType(), False),
    ("valid_to", T.DateType(), False),
    ("client", T.StringType(), False),
    *_SCD1_TAIL,
)

DIM_CLIENTS = _schema(
    ("client_id", T.StringType(), False),
    ("last_name", T.StringType(), False),
    ("first_name", T.StringType(), False),
    ("patronymic", T.StringType(), False),
    ("date_of_birth", T.DateType(), False),
    ("passport_num", T.StringType(), False),
    ("passport_valid_to", T.DateType(), False),
    ("phone", T.StringType(), False),
    *_SCD1_TAIL,
)

#: Report mart — append-only, 1 row per detected fraud event
#: (DDL.sql:155-169).
REPORT = _schema(
    ("fraud_dt", T.TimestampType(), False),
    ("passport", T.StringType(), False),
    ("fio", T.StringType(), False),
    ("phone", T.StringType(), False),
    ("fraud_type", T.StringType(), False),
    ("report_dt", T.TimestampType(), False),
)

#: Per-dimension metadata shared by ETL + mart: (hist table name, scd1
#: table name, natural key in dim, key column in landing, tracked
#: attribute columns as (landing_col, dim_col) pairs).
DIMENSIONS = {
    "terminals": {
        "hist": "dim_terminals_hist",
        "scd1": "dim_terminals",
        "key": "terminal_id",
        "attrs": [("terminal", "terminal_id"),
                  ("terminal_type", "terminal_type"),
                  ("city", "terminal_city"),
                  ("address", "terminal_address")],
        "hist_schema": DIM_TERMINALS_HIST,
        "scd1_schema": DIM_TERMINALS,
    },
    "cards": {
        "hist": "dim_cards_hist",
        "scd1": "dim_cards",
        "key": "card_num",
        "attrs": [("card_num", "card_num"),
                  ("account_num", "account_num")],
        "hist_schema": DIM_CARDS_HIST,
        "scd1_schema": DIM_CARDS,
    },
    "accounts": {
        "hist": "dim_accounts_hist",
        "scd1": "dim_accounts",
        "key": "account_num",
        "attrs": [("account_num", "account_num"),
                  ("account_valid_to", "valid_to"),
                  ("client", "client")],
        "hist_schema": DIM_ACCOUNTS_HIST,
        "scd1_schema": DIM_ACCOUNTS,
    },
    "clients": {
        "hist": "dim_clients_hist",
        "scd1": "dim_clients",
        "key": "client_id",
        "attrs": [("client", "client_id"),
                  ("last_name", "last_name"),
                  ("first_name", "first_name"),
                  ("patronymic", "patronymic"),
                  ("date_of_birth", "date_of_birth"),
                  ("passport_num", "passport_num"),
                  ("passport_valid_to", "passport_valid_to"),
                  ("phone", "phone")],
        "hist_schema": DIM_CLIENTS_HIST,
        "scd1_schema": DIM_CLIENTS,
    },
}

#: Russian business-string constants (Data_mart.sql:51,56,80,266-278).
RESULT_DECLINED = "Отказ"
RESULT_SUCCESS = "Успешно"
FRAUD_EXPIRED_PASSPORT = "Совершение операции при просроченном паспорте"
FRAUD_EXPIRED_ACCOUNT = "Совершение операции при недействующем договоре"
FRAUD_CITY_HOP = "Совершение операции в разных городах в течение 1 часа"
FRAUD_AMOUNT_GUESS = "Попытка подбора сумм"
