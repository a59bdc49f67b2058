"""Portable hashing / shingling expression builders.

Every hash used by the dedup & fingerprint operators is derived from
``md5`` (identical hex output in Spark and DuckDB) so that oracle
queries can replicate the algorithms bit-for-bit:

- 60-bit token hash: first 15 hex chars of md5 parsed as int64
  (Spark ``conv(...,16,10)``, DuckDB ``('0x'||...)::BIGINT``);
- minhash permutation i: ``min(substr(md5(i || '|' || shingle),1,15))``
  — a string minimum over uniformly distributed hex, which is a valid
  min-wise hash family and needs no modular arithmetic;
- word n-gram shingles from a single-space tokenizer.

These run entirely inside whole-stage codegen (no Python UDFs) — the
hot dedup path stays JVM-side at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: number of minhash permutations; with per-permutation banding (r=1)
#: the probability of missing a pair with jaccard j is (1-j)^K — at the
#: 0.5 threshold that is < 3e-10, so candidate recall is exact for all
#: practical purposes and the post-verification output equals the
#: brute-force ground truth the oracle computes.
MINHASH_PERMS = 32

SIMHASH_BITS = 60          # 15 hex chars -> fits signed int64
SIMHASH_BAND_BITS = 6      # 10 bands; pigeonhole-complete for dist <= 9


def word_shingles(text_col: str = "text", n: int = 3) -> Column:
    """Distinct word n-gram shingles of a single-space-tokenized text."""
    t = f"split({text_col}, ' ')"
    return F.expr(
        f"CASE WHEN size({t}) >= {n} THEN "
        f"array_distinct(transform(sequence(0, size({t}) - {n}), "
        f"i -> concat_ws(' ', slice({t}, i + 1, {n})))) "
        f"ELSE array({text_col}) END")


def word_shingles_sql(text_expr: str = "text", n: int = 3) -> str:
    """DuckDB twin of :func:`word_shingles`."""
    joins = " || ' ' || ".join(f"w[i+{k}]" for k in range(n))
    # range() is end-exclusive: last shingle starts at len(w) - n + 1
    return (f"CASE WHEN len(string_split({text_expr}, ' ')) >= {n} THEN "
            f"(SELECT list_distinct([{joins} "
            f"for i in range(1, len(w) - {n - 2})]) "
            f"FROM (SELECT string_split({text_expr}, ' ') w)) "
            f"ELSE [{text_expr}] END")


def char_ngrams(text_col: str = "text", n: int = 4) -> Column:
    """Distinct character n-grams."""
    return F.expr(
        f"CASE WHEN length({text_col}) >= {n} THEN "
        f"array_distinct(transform(sequence(1, length({text_col}) - {n - 1}),"
        f" i -> substring({text_col}, i, {n}))) "
        f"ELSE array({text_col}) END")


def char_ngrams_sql(text_expr: str = "text", n: int = 4) -> str:
    return (f"CASE WHEN len({text_expr}) >= {n} THEN "
            f"list_distinct([{text_expr}[i:i+{n - 1}] "
            f"for i in range(1, len({text_expr}) - {n - 2})]) "
            f"ELSE [{text_expr}] END")


def hash60(col: Column) -> Column:
    """60-bit integer hash of a string column (JVM-side)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


HASH60_SQL = "('0x' || substr(md5({0}), 1, 15))::BIGINT"


def minhash_agg(perm: int, shingle_col: str = "sh") -> Column:
    """min-wise hash aggregate for permutation ``perm`` over exploded
    shingles."""
    return F.min(F.substring(
        F.md5(F.concat_ws("|", F.lit(str(perm)), F.col(shingle_col))),
        1, 15)).alias(f"m{perm}")


MINHASH_AGG_SQL = "min(substr(md5('{p}|' || sh), 1, 15)) AS m{p}"


def jaccard(a: Column, b: Column) -> Column:
    """Exact jaccard of two string arrays — single double division."""
    return (F.size(F.array_intersect(a, b)).cast("double")
            / F.size(F.array_union(a, b)))


JACCARD_SQL = ("len(list_intersect({a}, {b}))::DOUBLE "
               "/ len(list_distinct(list_concat({a}, {b})))")
