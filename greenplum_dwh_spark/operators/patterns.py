"""Generic sequential pattern matching over ordered per-key event
streams — a MATCH_RECOGNIZE-style operator built from window algebra.

A pattern is an ordered list of row predicates; a match is a run of
consecutive rows (per key, in order) satisfying them, optionally
within a time budget measured from the first to the last row. The
matcher compiles the pattern into ``len(pattern) − 1`` lag expressions
over one window — fully relational, no Python, one shuffle by key —
which is exactly how chain_fraud_window (the oracle-checked member of
this family) is built. Patterns requiring unbounded repetition
(``A+ B``) are NOT expressible this way; that is the state-machine
territory of mart/chains.py (SURVEY.md §2.10 U3).

Example — the fraud chain::

    match_pattern(
        events, key="user_id", order=["ts", "event_id"], ts_col="ts",
        pattern=[is_error & decreasing, is_error, is_purchase],
        within_sec=1200)

where each pattern step is a function Column-builder receiving a
``lag`` accessor for relative row references.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: a pattern step: fn(col, n) -> Column where col(name, offset) returns
#: the named column ``offset`` rows BEFORE the match's last row.
Step = Callable[[Callable[[str, int], Column]], Column]


def match_pattern(df: DataFrame, key: str, order: list[str],
                  pattern: list[Step], ts_col: str | None = None,
                  within_sec: int | None = None) -> DataFrame:
    """Rows that END a match of ``pattern`` (anchored at each row)."""
    k = len(pattern)
    w = Window.partitionBy(key).orderBy(*order)

    def make_col(step_idx: int):
        # step i of k matches the row lagged by (k-1-i)
        back = k - 1 - step_idx

        def col(name: str, offset: int = 0) -> Column:
            lag_n = back + offset
            return (F.col(name) if lag_n == 0
                    else F.lag(name, lag_n).over(w))
        return col

    cond = None
    for i, step in enumerate(pattern):
        c = step(make_col(i))
        cond = c if cond is None else (cond & c)
    if within_sec is not None:
        if ts_col is None:
            raise ValueError("within_sec requires ts_col")
        span = (F.unix_timestamp(F.col(ts_col))
                - F.unix_timestamp(F.lag(ts_col, k - 1).over(w)))
        cond = cond & (span < within_sec)
    return df.withColumn("_match", cond).filter(F.col("_match")) \
             .drop("_match")
