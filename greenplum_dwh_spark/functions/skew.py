"""Skew-mitigation utilities (SURVEY.md §4: "salting only if a client
key ever becomes hot").

AQE's skew-join handling covers sort-merge joins automatically; these
helpers cover the two places AQE doesn't: hot-key *aggregations* (a
single reducer owning a hot group) and broadcast-ineligible hot-key
joins. Both are pure plan rewrites — results are identical to the
unsalted forms (asserted in tests), only the exchange layout changes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted(df: DataFrame, buckets: int = 16,
           col_name: str = "_salt") -> DataFrame:
    """Append a deterministic-per-row random salt column."""
    return df.withColumn(
        col_name,
        F.pmod(F.xxhash64(*df.columns), F.lit(buckets)).cast("int"))


def salted_count_sum(df: DataFrame, key: str, value: str,
                     buckets: int = 16) -> DataFrame:
    """Two-phase hot-key aggregation: partial agg on (key, salt), final
    agg on key. The first exchange spreads a hot key over ``buckets``
    reducers; the second merges ``buckets`` rows per key — the manual
    form of map-side combine for algebraic aggregates.

    Returns (key, n, total) with total as scaled-int exact sum.
    """
    part = (salted(df, buckets)
            .groupBy(key, "_salt")
            .agg(F.count(F.lit(1)).alias("_n"),
                 F.sum(F.round(F.col(value) * 100).cast("long"))
                 .alias("_s")))
    return (part.groupBy(key)
            .agg(F.sum("_n").alias("n"),
                 (F.sum("_s").cast("double") / 100.0).alias("total")))


def salted_join(big: DataFrame, small: DataFrame, key: str,
                buckets: int = 16) -> DataFrame:
    """Hot-key equi-join: salt the big side, replicate the small side
    ``buckets``× with an exploded salt, join on (key, salt). Use when
    the small side is too big to broadcast but the big side's key
    distribution is skewed."""
    b = big.withColumn(
        "_salt",
        F.pmod(F.xxhash64(*big.columns), F.lit(buckets)).cast("int"))
    s = (small.withColumn(
            "_salt", F.explode(F.array(*[F.lit(i) for i in range(buckets)]))))
    return b.join(s, on=[key, "_salt"]).drop("_salt")
