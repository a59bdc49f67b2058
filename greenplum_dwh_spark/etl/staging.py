"""Dimension staging derivations from the landing table.

Reference: the temp-table CTAS blocks of ``fn_normalize_transactions``
(ETL.sql:11-84 for SCD2, ETL.sql:243-354 for SCD1). Both start from the
same shape: GROUP BY the dimension's attribute tuple with
``min(trans_date)`` as the version timestamp ("set start_dt not with
date of etl process, but with last transaction date", ETL.sql:25) —
a map-side-combinable aggregation, so at 100 TB this is one shuffle on
the attribute tuple, partial-aggregated before exchange.

SCD2 adds ``lead(start_dt)`` per key ("in case if dimension changes
during one day more than once", ETL.sql:17) so intra-batch versions are
already closed when inserted.

SCD1 collapses to one row per key: ``last_value(attr)`` ordered by
create_dt over an explicit unbounded frame (ETL.sql:252-254),
``min/max(create_dt)`` per key, and ``update_dt = NULL`` when the batch
saw a single version (ETL.sql:256-260). The reference applies
``SELECT DISTINCT`` only in the terminals branch (ETL.sql:250) but the
windowed output is constant per key in every branch, so we apply the
dedup uniformly (this also fixes the reference's latent duplicate-insert
for brand-new multi-version entities in the other three dims).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def grouped_versions(landing: DataFrame, attrs: list[tuple[str, str]],
                     ts_alias: str) -> DataFrame:
    """GROUP BY attribute tuple + min(trans_date) (ETL.sql:20-27 etc.)."""
    cols = [F.col(src).alias(dst) for src, dst in attrs]
    return (landing.groupBy(*cols)
            .agg(F.min("trans_date").alias(ts_alias)))


def scd2_staging(landing: DataFrame, meta: dict) -> DataFrame:
    """Attribute-tuple versions with lead() close-out (ETL.sql:11-84)."""
    base = grouped_versions(landing, meta["attrs"], "start_dt")
    w = Window.partitionBy(meta["key"]).orderBy("start_dt")
    return base.withColumn("end_dt", F.lead("start_dt").over(w))


def scd1_staging(landing: DataFrame, meta: dict) -> DataFrame:
    """One current row per key via last_value windows (ETL.sql:243-354).

    Ordering ties on create_dt are broken by the attribute values
    themselves so the result is deterministic (the reference orders by
    create_dt only and lets the engine pick)."""
    key = meta["key"]
    nonkey = [dst for _, dst in meta["attrs"] if dst != key]
    base = grouped_versions(landing, meta["attrs"], "create_dt")
    order = [F.col("create_dt")] + [F.col(c) for c in nonkey]
    w_last = (Window.partitionBy(key).orderBy(*order)
              .rowsBetween(Window.unboundedPreceding,
                           Window.unboundedFollowing))
    w_key = Window.partitionBy(key)
    mx, mn = F.max("create_dt").over(w_key), F.min("create_dt").over(w_key)
    return (base.select(
        F.col(key),
        *[F.last(c).over(w_last).alias(c) for c in nonkey],
        mn.alias("create_dt"),
        F.when(mx == mn, F.lit(None).cast("timestamp"))
         .otherwise(mx).alias("update_dt"),
    ).distinct())
