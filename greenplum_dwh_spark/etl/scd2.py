"""SCD2 apply: close-out + insert of new attribute versions.

Reference semantics (ETL.sql:86-119 and the three analogous blocks):

1. ``changes`` = staged versions whose **attribute tuple** (validity
   columns excluded) does not yet exist anywhere in the hist dim —
   a correlated NOT EXISTS over all attribute columns
   (ETL.sql:92-99), i.e. a multi-column left anti join.
2. UPDATE: the dim's open row (``end_dt IS NULL``) for a key gets
   ``end_dt = changes.start_dt`` taken from the **newest** staged
   change of that key (``sc.end_dt IS NULL`` guard, ETL.sql:104) —
   older intra-batch versions were already closed by lead().
3. INSERT: every ``changes`` row is appended as-is (ETL.sql:106-119).

Quirks preserved on purpose: an entity reverting to an attribute tuple
it held before produces *no* new version (the tuple already exists in
hist); the cards-hist NOT EXISTS matching on (account_num, card_num)
and the duplicated passport_num predicate (ETL.sql:170-172,201-207)
are set-equality no-ops, so plain tuple anti-join reproduces them.

Spark shape: dims are orders of magnitude smaller than facts (the
close-out never touches the fact table), so the copy-on-write rewrite
is a key-broadcast join + union; under Delta this same function body
becomes one ``MERGE INTO``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def scd2_changes(staged: DataFrame, dim: DataFrame,
                 attr_cols: list[str]) -> DataFrame:
    """Staged rows whose attr tuple is not present in the dim."""
    return staged.join(dim.select(*attr_cols), on=attr_cols, how="left_anti")


def scd2_apply(dim: DataFrame, staged: DataFrame, key: str,
               attr_cols: list[str]) -> DataFrame:
    """Return the new full contents of the hist dim."""
    changes = scd2_changes(staged, dim, attr_cols)
    # newest staged change per key closes the open dim row (ETL.sql:104)
    closer = (changes.filter(F.col("end_dt").isNull())
              .select(F.col(key), F.col("start_dt").alias("_new_end")))
    closed = (dim.join(F.broadcast(closer), on=key, how="left")
              .withColumn(
                  "end_dt",
                  F.when(F.col("end_dt").isNull()
                         & F.col("_new_end").isNotNull(),
                         F.col("_new_end"))
                  .otherwise(F.col("end_dt")))
              .drop("_new_end"))
    return closed.unionByName(changes.select(*dim.columns))
