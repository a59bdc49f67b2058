"""Deduplication operators for large-scale training-data pipelines.

Four members, each a different point on the exactness/scale frontier
(BASELINE.json north star; PAPERS.md set-similarity-join literature):

- ``dedup_exact`` — hash-groupBy on content digest. One shuffle on the
  digest; at 100 TB this is the classic first pass (map-side combine on
  md5 keys, no skew because digests are uniform).
- ``dedup_minhash_lsh`` — word-3-gram shingles → 64 min-wise hashes
  (arithmetic permutations over one xxhash64) → 32 bands × 2 rows →
  candidate pairs → **exact jaccard verification**. The verification
  step makes the output equal to the brute-force ground truth (miss
  probability (1-j²)^32 < 1e-14 where this corpus' near-dups live),
  which is exactly what the DuckDB oracle computes — the approximate
  scale path is checked against the exact answer.
- ``dedup_simhash`` — 60-bit simhash over shingle hashes, 10×6-bit
  band join (pigeonhole-complete for hamming ≤ 9) + exact hamming
  verify at ≤ 8. Again: banded plan, ground-truth output.
- ``dedup_jaccard_prefix`` — exact word-2-gram jaccard join via
  prefix filtering (tokens globally ordered by document frequency; a
  pair above threshold t must share one of the first
  |A| − ⌈t·|A|⌉ + 1 rarest tokens) plus the size-ratio prune
  (t·|A| ≤ |B| ≤ |A|/t). Fully exact, no probabilistic step; the
  candidate set is linear-ish under a Zipfian vocabulary (this
  synthetic corpus's tiny uniform vocabulary is the worst case for
  prefix discrimination — a realistic corpus prunes far harder).

All hot paths are pure Spark SQL expressions (whole-stage codegen);
no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from greenplum_dwh_spark.functions import hashing as H
from greenplum_dwh_spark.sources.tpch import Tables

JACCARD_THRESHOLD = 0.5
SIMHASH_MAX_DIST = 8
PREFIX_THRESHOLD = 0.6


def exact_dedup(docs: DataFrame) -> DataFrame:
    """One row per distinct text: digest, cluster size, representative
    (min doc_id) — the exact-dedup primitive. ``docs`` needs
    (doc_id, text)."""
    return (docs
            .select(F.md5("text").alias("digest"), "doc_id")
            .groupBy("digest")
            .agg(F.count(F.lit(1)).alias("n_copies"),
                 F.min("doc_id").alias("rep_doc_id")))


def _pairs_with_jaccard(docs: DataFrame, pairs: DataFrame,
                        sets_df: DataFrame) -> DataFrame:
    """pairs (doc_a, doc_b) × per-doc shingle sets → exact jaccard."""
    a = sets_df.alias("sa")
    b = sets_df.alias("sb")
    return (pairs
            .join(a, F.col("doc_a") == F.col("sa.doc_id"))
            .join(b, F.col("doc_b") == F.col("sb.doc_id"))
            .select("doc_a", "doc_b",
                    H.jaccard(F.col("sa.s"), F.col("sb.s")).alias("jac")))


def minhash_pairs(docs: DataFrame,
                  threshold: float = JACCARD_THRESHOLD) -> DataFrame:
    """Near-duplicate pairs (doc_a, doc_b, jac) of a (doc_id, text)
    DataFrame via minhash-LSH + exact verification."""
    sets_df = H.with_word_shingles(docs).cache()
    ex = sets_df.select("doc_id", F.explode("s").alias("sh"))
    sig = ex.groupBy("doc_id").agg(*H.minhash_aggs())
    n_bands = H.MINHASH_PERMS // H.MINHASH_BAND_R
    bands = sig.select(
        "doc_id",
        F.explode(F.array(*[
            F.concat_ws(":", F.lit(str(b)),
                        *[F.col(f"m{b * H.MINHASH_BAND_R + r}")
                          for r in range(H.MINHASH_BAND_R)])
            for b in range(n_bands)])).alias("band"))
    cand = (bands.alias("a")
            .join(bands.alias("b"), "band")
            .filter(F.col("a.doc_id") < F.col("b.doc_id"))
            .select(F.col("a.doc_id").alias("doc_a"),
                    F.col("b.doc_id").alias("doc_b"))
            .distinct())
    return (_pairs_with_jaccard(docs, cand, sets_df)
            .filter(F.col("jac") >= threshold))


def simhash_fingerprints(docs: DataFrame) -> DataFrame:
    """60-bit simhash per doc over word-3-gram shingle hashes."""
    ex = (H.with_word_shingles(docs)
          .select("doc_id", F.explode("s").alias("sh")))
    h = ex.select("doc_id", H.hash60(F.col("sh")).alias("hh"))
    bit_sums = h.groupBy("doc_id").agg(*[
        F.sum(F.when(F.shiftright(F.col("hh"), j).bitwiseAND(1) == 1,
                     1).otherwise(-1)).alias(f"s{j}")
        for j in range(H.SIMHASH_BITS)])
    fp = sum([F.when(F.col(f"s{j}") > 0, F.lit(1 << j).cast("long"))
              .otherwise(F.lit(0).cast("long"))
              for j in range(H.SIMHASH_BITS)], F.lit(0).cast("long"))
    return bit_sums.select("doc_id", fp.alias("fp"))


def simhash_pairs(docs: DataFrame,
                  max_dist: int = SIMHASH_MAX_DIST) -> DataFrame:
    """Pairs within hamming ``max_dist`` of 60-bit simhash (exact:
    banding is pigeonhole-complete for dist ≤ 9)."""
    fps = simhash_fingerprints(docs).cache()
    n_bands = H.SIMHASH_BITS // H.SIMHASH_BAND_BITS
    mask = (1 << H.SIMHASH_BAND_BITS) - 1
    bands = fps.select(
        "doc_id",
        F.explode(F.array(*[
            F.concat_ws(":", F.lit(str(b)),
                        F.shiftright(F.col("fp"),
                                     b * H.SIMHASH_BAND_BITS)
                        .bitwiseAND(mask).cast("string"))
            for b in range(n_bands)])).alias("band"))
    cand = (bands.alias("a")
            .join(bands.alias("b"), "band")
            .filter(F.col("a.doc_id") < F.col("b.doc_id"))
            .select(F.col("a.doc_id").alias("doc_a"),
                    F.col("b.doc_id").alias("doc_b"))
            .distinct())
    fa = fps.select(F.col("doc_id").alias("doc_a"),
                    F.col("fp").alias("fp_a"))
    fb = fps.select(F.col("doc_id").alias("doc_b"),
                    F.col("fp").alias("fp_b"))
    return (cand.join(fa, "doc_a").join(fb, "doc_b")
            .select("doc_a", "doc_b",
                    F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b")))
                    .cast("int").alias("hamming"))
            .filter(F.col("hamming") <= max_dist))


def jaccard_prefix_pairs(docs: DataFrame,
                         threshold: float = PREFIX_THRESHOLD) -> DataFrame:
    """Exact word-2-gram jaccard join via prefix filtering."""
    grams = H.with_word_shingles(docs, n=2).cache()
    ex = grams.select("doc_id", F.explode("s").alias("g"),
                      F.size("s").alias("n"))
    freq = ex.groupBy("g").agg(F.count(F.lit(1)).alias("df"))
    w = Window.partitionBy("doc_id").orderBy("df", "g")
    prefix = (ex.join(freq, "g")
              .withColumn("rk", F.row_number().over(w))
              # |A| - ceil(t*|A|) + 1 rarest tokens form the prefix
              .filter(F.col("rk")
                      <= F.col("n") - F.ceil(F.col("n") * threshold) + 1)
              .select("doc_id", "g", "n"))
    cand = (prefix.alias("a").join(prefix.alias("b"), "g")
            .filter((F.col("a.doc_id") < F.col("b.doc_id"))
                    # size-ratio prune: j >= t forces t|A| <= |B| <= |A|/t
                    & (F.col("b.n") >= F.col("a.n") * threshold)
                    & (F.col("b.n") * threshold <= F.col("a.n")))
            .select(F.col("a.doc_id").alias("doc_a"),
                    F.col("b.doc_id").alias("doc_b"))
            .distinct())
    return (_pairs_with_jaccard(docs, cand, grams)
            .filter(F.col("jac") >= threshold))


def neardup_clusters(docs: DataFrame,
                     threshold: float = JACCARD_THRESHOLD) -> DataFrame:
    """Connected components over the near-dup pair graph — the dedup
    *clustering* step that turns pairs into groups (pick one
    representative per cluster to keep). Iterative min-label
    propagation in DataFrame algebra: each round joins current labels
    across edges and keeps the minimum; converges in O(diameter)
    rounds (near-dup clusters are tiny, so 2-3). The driver loop only
    checks a changed-row count per round — no data is collected.

    Returns (doc_id, cluster_id) for every doc that has ≥1 near-dup.
    """
    edges = (minhash_pairs(docs, threshold)
             .select("doc_a", "doc_b").cache())
    bidir = (edges.select(F.col("doc_a").alias("u"),
                          F.col("doc_b").alias("v"))
             .unionByName(edges.select(F.col("doc_b").alias("u"),
                                       F.col("doc_a").alias("v"))))
    labels = (bidir.select("u").distinct()
              .select("u", F.col("u").alias("lbl")).cache())
    for _ in range(20):  # >= max component diameter; tiny in practice
        prop = (bidir.join(labels, "u")
                .select(F.col("v").alias("u"), "lbl"))
        new_labels = (labels.unionByName(prop)
                      .groupBy("u").agg(F.min("lbl").alias("lbl")).cache())
        changed = (new_labels.join(labels.withColumnRenamed("lbl", "old"),
                                   "u")
                   .filter(F.col("lbl") != F.col("old")).count())
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    return labels.select(F.col("u").alias("doc_id"),
                         F.col("lbl").alias("cluster_id"))


def _docs(spark, sf_dir):
    return Tables(spark, sf_dir).documents


# driver-contract wrappers over the DataFrame-level library API
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return exact_dedup(_docs(spark, sf_dir))


def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return minhash_pairs(_docs(spark, sf_dir))


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return simhash_pairs(_docs(spark, sf_dir))


def dedup_jaccard_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    return jaccard_prefix_pairs(_docs(spark, sf_dir))


def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    return neardup_clusters(_docs(spark, sf_dir))


QUERIES = {
    "dedup_exact": dedup_exact,
    "dedup_minhash_lsh": dedup_minhash_lsh,
    "dedup_simhash": dedup_simhash,
    "dedup_jaccard_prefix": dedup_jaccard_prefix,
    "dedup_clusters": dedup_clusters,
}

_W3 = H.word_shingles_sql()
_W2 = H.word_shingles_sql(n=2)
_J = H.JACCARD_SQL.format(a="a.s", b="b.s")

#: the LSH/banded plans verify candidates exactly, so the oracle is the
#: brute-force ground truth — any recall loss would surface as a
#: row-count mismatch.
ORACLES = {
    "dedup_exact": """
        SELECT md5(text) AS digest, count(*) AS n_copies,
               min(doc_id) AS rep_doc_id
        FROM documents GROUP BY md5(text)""",
    "dedup_minhash_lsh": f"""
        WITH sh AS (SELECT doc_id, {_W3} AS s FROM documents)
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, {_J} AS jac
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE {_J} >= {JACCARD_THRESHOLD}""",
    "dedup_simhash": f"""
        WITH sh AS (SELECT doc_id, {_W3} AS s FROM documents),
        ex AS (SELECT doc_id, unnest(s) AS sh FROM sh),
        h AS (SELECT doc_id, {H.HASH60_SQL.format('sh')} AS hh FROM ex),
        bits AS (SELECT doc_id,
            {', '.join(f'sum(CASE WHEN (hh >> {j}) & 1 = 1 THEN 1 ELSE -1 END) s{j}' for j in range(H.SIMHASH_BITS))}
            FROM h GROUP BY doc_id),
        fp AS (SELECT doc_id,
            ({' + '.join(f'(CASE WHEN s{j} > 0 THEN {1 << j} ELSE 0 END)::BIGINT' for j in range(H.SIMHASH_BITS))})
            AS fp FROM bits)
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               bit_count(xor(a.fp, b.fp))::INT AS hamming
        FROM fp a JOIN fp b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.fp, b.fp)) <= {SIMHASH_MAX_DIST}""",
    "dedup_clusters": f"""
        WITH RECURSIVE
        sh AS (SELECT doc_id, {_W3} AS s FROM documents),
        edges AS (SELECT a.doc_id da, b.doc_id db
                  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
                  WHERE {_J} >= {JACCARD_THRESHOLD}),
        bidir AS (SELECT da u, db v FROM edges
                  UNION ALL SELECT db, da FROM edges),
        nodes AS (SELECT DISTINCT u FROM bidir),
        walk(u, lbl) AS (
          SELECT u, u FROM nodes
          UNION
          SELECT b.v, walk.lbl FROM walk JOIN bidir b ON b.u = walk.u
          WHERE walk.lbl < b.v)
        SELECT u AS doc_id, min(lbl) AS cluster_id FROM walk GROUP BY u""",
    "dedup_jaccard_prefix": f"""
        WITH sh AS (SELECT doc_id, {_W2} AS s FROM documents)
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, {_J} AS jac
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE {_J} >= {PREFIX_THRESHOLD}""",
}
