"""SCD1 apply: in-place overwrite of changed attributes + insert of new
keys.

Reference semantics (ETL.sql:356-445), per dimension:

- UPDATE rows whose key exists and whose *updateable* attribute subset
  differs (NULL-unsafe ``!=`` disjunction — all attrs are non-null by
  schema, ETL.sql:362,382,401,426-432). Only that subset is
  overwritten — e.g. terminals never update ``terminal_type``
  (ETL.sql:356-362). ``update_dt = coalesce(stg.update_dt,
  stg.create_dt)`` (ETL.sql:360).
- INSERT staged rows whose key is absent (key-only NOT EXISTS,
  ETL.sql:369-373), keeping the staged create_dt/update_dt.

The clients INSERT select-list bug (``passport_num create_dt``,
ETL.sql:437) is positional and therefore semantically the intended
mapping — we port the intent (SURVEY.md §2.11.1).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: updateable attribute subset per dim (the reference UPDATE set-lists).
UPDATE_ATTRS = {
    "terminals": ["terminal_city", "terminal_address"],
    "cards": ["account_num"],
    "accounts": ["valid_to", "client"],
    "clients": ["last_name", "first_name", "patronymic", "date_of_birth",
                "passport_num", "passport_valid_to", "phone"],
}


def scd1_is_noop(dim: DataFrame, staged: DataFrame, key: str,
                 update_attrs: list[str]) -> bool:
    """True when the batch would neither update nor insert: no staged
    key is new, and no matched key differs on an updateable attr —
    lets the caller skip the copy-on-write rewrite in steady state."""
    if not staged.join(dim.select(key), on=key, how="left_anti").isEmpty():
        return False
    s = staged.select(key, *[F.col(c).alias(f"_s_{c}")
                             for c in update_attrs])
    differs = reduce(lambda a, b: a | b,
                     [F.col(f"_s_{c}") != F.col(c) for c in update_attrs])
    return dim.join(s, on=key).filter(differs).isEmpty()


def scd1_apply(dim: DataFrame, staged: DataFrame, key: str,
               update_attrs: list[str]) -> DataFrame:
    """Return the new full contents of the SCD1 dim."""
    s = staged.select(
        F.col(key),
        *[F.col(c).alias(f"_s_{c}") for c in update_attrs],
        F.coalesce("update_dt", "create_dt").alias("_s_upd"))
    changed = reduce(lambda a, b: a | b,
                     [F.col(f"_s_{c}") != F.col(c) for c in update_attrs])
    # materialize the predicate BEFORE overwriting attrs, so later
    # columns don't compare against already-updated values
    updated = (dim.join(F.broadcast(s), on=key, how="left")
               .withColumn("_changed", changed))
    for c in update_attrs:
        updated = updated.withColumn(
            c, F.when(F.col("_changed"), F.col(f"_s_{c}")).otherwise(F.col(c)))
    updated = (updated.withColumn(
        "update_dt",
        F.when(F.col("_changed"), F.col("_s_upd")).otherwise(F.col("update_dt")))
        .select(*dim.columns))
    inserts = staged.join(dim.select(key), on=key, how="left_anti")
    return updated.unionByName(inserts.select(*dim.columns))
