"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship multi-join revenue query on sf0.001;
``queries``/``oracle_sql`` expose the full operator inventory of
SURVEY.md §2 plus the training-data-pipeline extensions (dedup,
similarity search, text analysis, sessionization, multimodal columns).

Queries without an ``oracle_sql`` entry are the deliberately
non-SQL-exact ones: ``ann_ivf_topk`` (approximate IVF scale path;
recall vs the exact operator is asserted in tests),
``multimodal_features`` (Arrow mapInPandas byte features) and
``chain_fraud_state`` (general ≥3-chain state machine — the
fixed-lookback window variant ``chain_fraud_window`` IS oracle-checked,
and the state machine itself is golden-tested in tests/ against the
reference semantics).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _modules():
    from greenplum_dwh_spark.operators import (dedup, multimodal_ops,
                                               packing, quality,
                                               relational, sessions,
                                               similarity, text_analysis)
    return [relational, dedup, text_analysis, similarity, sessions,
            multimodal_ops, quality, packing]


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from greenplum_dwh_spark.operators.relational import q5_nation_revenue
    return q5_nation_revenue(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable] = {}
    for mod in _modules():
        out.update(mod.QUERIES)
    from greenplum_dwh_spark.operators.chains_events import (
        chain_fraud_state)
    out["chain_fraud_state"] = chain_fraud_state
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _modules():
        out.update(mod.ORACLES)
    return out
