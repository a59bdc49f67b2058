"""Property-based SCD2 equivalence: random multi-batch version
histories through the Spark staging+apply pipeline must match an
in-memory transliteration of the reference semantics (ETL.sql:11-119):
per batch, group attr tuples with min(ts), lead-close intra-batch,
changes = tuples absent from hist, newest change closes the open row,
all changes inserted."""

from __future__ import annotations

import datetime as dt

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import types as T

from greenplum_dwh_spark.etl.scd2 import scd2_apply
from greenplum_dwh_spark.etl.staging import scd2_staging
from greenplum_dwh_spark.schemas import DIM_CARDS_HIST, DIMENSIONS

T0 = dt.datetime(2020, 5, 1)

LANDING_MINI = T.StructType([
    T.StructField("card_num", T.StringType()),
    T.StructField("account_num", T.StringType()),
    T.StructField("trans_date", T.TimestampType()),
])


def model_scd2(batches):
    """In-memory reference model. hist rows: [key, attr, start, end]."""
    hist: list[list] = []
    for batch in batches:
        # stage: min ts per (key, attr) tuple, lead over start_dt per key
        grouped: dict = {}
        for key, attr, ts in batch:
            k = (key, attr)
            grouped[k] = min(grouped.get(k, ts), ts)
        staged = sorted(
            ((key, attr, start) for (key, attr), start in grouped.items()),
            key=lambda r: (r[0], r[2]))
        with_end = []
        for i, (key, attr, start) in enumerate(staged):
            nxt = None
            if i + 1 < len(staged) and staged[i + 1][0] == key:
                nxt = staged[i + 1][2]
            with_end.append([key, attr, start, nxt])
        # changes: attr tuple not present anywhere in hist
        hist_tuples = {(r[0], r[1]) for r in hist}
        changes = [r for r in with_end
                   if (r[0], r[1]) not in hist_tuples]
        # close-out: newest change (end is None) closes the open row
        closers = {r[0]: r[2] for r in changes if r[3] is None}
        for r in hist:
            if r[3] is None and r[0] in closers:
                r[3] = closers[r[0]]
        hist.extend([list(r) for r in changes])
    return sorted((r[0], r[1], r[2], r[3]) for r in hist)


@st.composite
def version_batches(draw):
    n_batches = draw(st.integers(1, 3))
    batches = []
    t = 0
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
def test_scd2_pipeline_matches_reference_model(spark, batches):
    meta = dict(DIMENSIONS["cards"])
    dim = spark.createDataFrame([], DIM_CARDS_HIST)
    for batch in batches:
        if not batch:
            continue
        landing = spark.createDataFrame(
            [(k, a, ts) for k, a, ts in batch], LANDING_MINI)
        staged = scd2_staging(landing, meta)
        dim = scd2_apply(dim, staged, "card_num",
                         ["card_num", "account_num"])
        # materialize each batch so later batches see applied state
        rows = dim.collect()
        dim = spark.createDataFrame(rows, DIM_CARDS_HIST)
    got = sorted((r["card_num"], r["account_num"], r["start_dt"],
                  r["end_dt"]) for r in dim.collect())
    assert got == model_scd2(batches)
