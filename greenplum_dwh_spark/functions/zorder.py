"""Z-order (Morton) key construction for multi-dimensional clustered
layout — the locality-preserving interleave Delta OPTIMIZE ZORDER and
Iceberg sort orders use.

A range-clustered layout (``TableStore.compact_append(cluster_cols)``)
skips row groups on ONE leading column; interleaving the bits of two
columns gives a single sort key whose contiguous ranges are bounded
rectangles in both dimensions, so min/max footer stats prune 2-D
point/box queries.  The key is a pure per-row integer expression
(shift/mask/or), identical in Spark and DuckDB — so the derivation
itself is oracle-checkable bit-for-bit.

Inputs must be non-negative and fit ``bits`` bits (values are masked,
i.e. taken mod 2^bits — callers normalize first: ids are already
dense, timestamps become day/hour offsets from a corpus epoch).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: bits interleaved per dimension (2 dims × 16 bits → 32-bit key)
ZBITS = 16


def zorder_key2(a: Column, b: Column, bits: int = ZBITS) -> Column:
    """Morton-interleave the low ``bits`` bits of two long columns:
    bit i of ``a`` lands at position 2i, bit i of ``b`` at 2i+1.
    The per-bit terms occupy disjoint positions, so a plain sum is the
    bitwise OR — and stays inside whole-stage codegen as one integer
    expression (no UDF, no loop at runtime)."""
    a = a.cast("long")
    b = b.cast("long")
    out = F.lit(0).cast("long")
    for i in range(bits):
        out = (out
               + F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)),
                             2 * i).cast("long")
               + F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)),
                             2 * i + 1).cast("long"))
    return out


def zorder_key2_sql(a: str, b: str, bits: int = ZBITS) -> str:
    """DuckDB twin of :func:`zorder_key2` (same shift/mask/sum form)."""
    terms = []
    for i in range(bits):
        terms.append(f"((({a} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({b} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")::BIGINT"
