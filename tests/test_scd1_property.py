"""Property-based SCD1 equivalence: random multi-batch version
histories through scd1_staging + scd1_apply must match an in-memory
transliteration of the reference semantics (ETL.sql:243-445): stage =
last_value per key ordered by min-batch-ts (create_dt = min, update_dt
= max or NULL for single-version batches); apply = overwrite the
updateable attrs when they differ (update_dt = coalesce(stg.update_dt,
stg.create_dt)), insert new keys as staged."""

from __future__ import annotations

import datetime as dt

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import types as T

from greenplum_dwh_spark.etl.scd1 import scd1_apply
from greenplum_dwh_spark.etl.staging import scd1_staging
from greenplum_dwh_spark.schemas import DIM_CARDS, DIMENSIONS

T0 = dt.datetime(2020, 5, 1)

LANDING_MINI = T.StructType([
    T.StructField("card_num", T.StringType()),
    T.StructField("account_num", T.StringType()),
    T.StructField("trans_date", T.TimestampType()),
])


def model_scd1(batches):
    """dim: key -> [attr, create_dt, update_dt]."""
    dim: dict = {}
    for batch in batches:
        if not batch:
            continue
        # stage: per (key, attr) min ts; per key: last attr by ts
        # (tie-break by attr value, mirroring scd1_staging's
        # deterministic ordering), create=min, update=max-or-None
        grouped: dict = {}
        for key, attr, ts in batch:
            k = (key, attr)
            grouped[k] = min(grouped.get(k, ts), ts)
        per_key: dict = {}
        for (key, attr), ts in grouped.items():
            per_key.setdefault(key, []).append((ts, attr))
        staged = {}
        for key, versions in per_key.items():
            versions.sort()  # by (ts, attr)
            create = min(ts for ts, _ in versions)
            update = (None if len(versions) == 1
                      else max(ts for ts, _ in versions))
            staged[key] = [versions[-1][1], create, update]
        for key, (attr, create, update) in staged.items():
            if key not in dim:
                dim[key] = [attr, create, update]
            elif dim[key][0] != attr:
                dim[key][0] = attr
                dim[key][2] = update if update is not None else create
            # unchanged attr: no-op (reference UPDATE predicate)
    return sorted((k, v[0], v[1], v[2]) for k, v in dim.items())


@st.composite
def version_batches(draw):
    n_batches = draw(st.integers(1, 3))
    batches, t = [], 0
    for _ in range(n_batches):
        n = draw(st.integers(0, 6))
        rows = []
        for _ in range(n):
            t += draw(st.integers(1, 5))
            rows.append((f"k{draw(st.integers(0, 2))}",
                         f"a{draw(st.integers(0, 3))}",
                         T0 + dt.timedelta(hours=t)))
        batches.append(rows)
    return batches


@pytest.mark.usefixtures("spark")
@given(version_batches())
@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
def test_scd1_pipeline_matches_reference_model(spark, batches):
    meta = dict(DIMENSIONS["cards"])
    dim = spark.createDataFrame([], DIM_CARDS)
    for batch in batches:
        if not batch:
            continue
        landing = spark.createDataFrame(batch, LANDING_MINI)
        staged = scd1_staging(landing, meta)
        dim = scd1_apply(dim, staged, "card_num", ["account_num"])
        dim = spark.createDataFrame(dim.collect(), DIM_CARDS)
    got = sorted((r["card_num"], r["account_num"], r["create_dt"],
                  r["update_dt"]) for r in dim.collect())
    assert got == model_scd1(batches)
