"""Local replica of the driver's t2 correctness gate: every declared
query must match its DuckDB oracle (bit-exact after normalization) at
sf0.001; queries without an oracle must at least run and return a
stable schema."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod
from greenplum_dwh_spark.plans.parity import compare

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


def test_every_oracle_key_has_a_query():
    assert set(ORACLES) <= set(QUERIES)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(name, spark, sf_dir):
    r = compare(QUERIES[name](spark, sf_dir), ORACLES[name], sf_dir)
    assert r["ok"], r


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(name, spark, sf_dir):
    df = QUERIES[name](spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0


def test_no_query_name_collisions_across_modules():
    """queries() merges module dicts — a duplicate name would silently
    shadow an operator and shrink driver coverage."""
    import __spark_entry__ as e
    total = sum(len(m.QUERIES) for m in e._modules()) + 1  # chain_fraud_state
    assert total == len(e.queries())
    assert sum(len(m.ORACLES) for m in e._modules()) == len(e.oracle_sql())


def test_rotation_lists_are_valid():
    """_RUN_FIRST/_RUN_LAST are the driver-budget lever (round-3
    verdict: a mis-ordered list silently starved 13 queries of their
    first driver check) — every entry must name a real query, no
    duplicates, and the no-oracle queries must all sit in _RUN_LAST
    so a rows-only check never displaces an oracle check."""
    qs = set(QUERIES)
    listed = entry_mod._RUN_FIRST + entry_mod._RUN_LAST
    unknown = [q for q in listed if q not in qs]
    assert not unknown, unknown
    assert len(listed) == len(set(listed))  # no dups across the lists
    no_oracle = qs - set(ORACLES)
    assert no_oracle <= set(entry_mod._RUN_LAST)
    # ordering actually applied: queries() starts with _RUN_FIRST and
    # ends with _RUN_LAST
    order = list(QUERIES)
    assert order[:len(entry_mod._RUN_FIRST)] == entry_mod._RUN_FIRST
    assert order[-len(entry_mod._RUN_LAST):] == entry_mod._RUN_LAST
