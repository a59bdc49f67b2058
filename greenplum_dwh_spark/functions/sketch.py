"""KMV (k-minimum-values) distinct-count sketch — a mergeable
cardinality sketch built from deterministic Spark primitives.

Unlike HLL (available as ``approx_count_distinct``), this sketch is
implemented *in* the engine: the sketch of a group is the k smallest
normalized hashes of its values. Properties that matter at 100 TB:

- **mergeable**: sketch(A ∪ B) == k-smallest of (sketch(A) ∪
  sketch(B)) — partial sketches combine associatively across partitions
  and across time (asserted exactly in tests, since the construction is
  deterministic);
- **bounded**: k int64s per group regardless of group size;
- **estimate**: D̂ = (k − 1) / max(sketch) with hashes normalized to
  (0, 1]; relative error ~ 1/√k.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_K = 64
_HASH_SPACE = float(1 << 61)


def _norm_hash(col) -> Column:
    """Deterministic hash of a value, normalized to (0, 1]."""
    return ((F.pmod(F.xxhash64(col), F.lit(1 << 61)).cast("double") + 1.0)
            / _HASH_SPACE)


def kmv_sketch(df: DataFrame, group_cols: list[str], value_col: str,
               k: int = DEFAULT_K) -> DataFrame:
    """Per-group KMV sketch: (group_cols..., sketch array<double>)."""
    return (df.select(*group_cols, _norm_hash(F.col(value_col))
                      .alias("_h"))
            .distinct()
            .groupBy(*group_cols)
            .agg(F.slice(F.array_sort(F.collect_set("_h")), 1, k)
                 .alias("sketch")))


def kmv_merge(a: Column, b: Column, k: int = DEFAULT_K) -> Column:
    """Merge two sketch arrays into the combined sketch."""
    return F.slice(F.array_sort(F.array_distinct(F.concat(a, b))), 1, k)


def kmv_estimate(sketch: Column, k: int = DEFAULT_K) -> Column:
    """Distinct-count estimate from a sketch array."""
    n = F.size(sketch)
    kth = F.element_at(sketch, n)
    # exact count when the group had fewer than k distinct values
    return F.when(n < k, n.cast("double")) \
            .otherwise((F.lit(float(k - 1))) / kth)


# ---------------------------------------------------------------------------
# Frequent items (heavy hitters): parallel Space-Saving (Metwally et
# al. top-k counting; merge per Cafaro et al.'s parallel summaries —
# public literature, see PAPERS.md).  Each partition keeps a bounded
# k-counter summary regardless of stream length; summaries are
# relational rows, so the merge is one groupBy — the same mergeable-
# partial discipline as the scaled-int sums and the KMV sketch.
#
# Guarantee carried through the merge: every item with true frequency
# > N/capacity appears in the merged summary, and each reported count
# overestimates by at most the summary's max_err (the classic
# Space-Saving bounds; the merged error is the sum of per-partition
# minimum counter values).


def _space_saving_partition(pdf_iter, item_col: str, capacity: int):
    """Bounded-memory per-partition summary: fold each Arrow batch's
    value_counts into a k-counter Space-Saving dict (persistent state
    is O(capacity); per-batch scratch is the batch's distinct count,
    the vectorized compromise that keeps the hot loop in numpy)."""
    import pandas as pd
    counters: dict = {}
    min_ct = 0
    for pdf in pdf_iter:
        for item, n in pdf[item_col].value_counts().items():
            if item in counters:
                counters[item] += int(n)
            elif len(counters) < capacity:
                counters[item] = int(n)
            else:
                # evict the minimum counter; the newcomer inherits its
                # count (the Space-Saving overestimate rule)
                evict = min(counters, key=counters.get)
                min_ct = counters.pop(evict)
                counters[item] = min_ct + int(n)
    if counters:
        err = min_ct
        yield pd.DataFrame({"item": list(counters),
                            "count_est": list(counters.values()),
                            "max_err": [err] * len(counters)})


def frequent_items(df: DataFrame, item_col: str,
                   capacity: int = 256, top_k: int = 20) -> DataFrame:
    """Top-k frequent items with bounded memory: per-partition
    Space-Saving summaries merged by one groupBy.  ``count_est`` is an
    upper bound on the true count; ``max_err`` bounds the overestimate
    (sum of per-partition eviction floors).  Any item with true
    frequency > N/capacity is guaranteed present."""
    from pyspark.sql import types as T
    schema = T.StructType([
        T.StructField("item", df.schema[item_col].dataType),
        T.StructField("count_est", T.LongType()),
        T.StructField("max_err", T.LongType()),
    ])
    summaries = df.select(item_col).mapInPandas(
        lambda it: _space_saving_partition(it, item_col, capacity),
        schema=schema)
    merged = (summaries.groupBy("item")
              .agg(F.sum("count_est").alias("count_est"),
                   F.sum("max_err").alias("max_err")))
    return (merged.orderBy(F.desc("count_est"), "item").limit(top_k))
