"""Hybrid-retrieval operators: lexical+semantic rank fusion and
vocabulary construction — the retrieval-side verbs of a training-data
pipeline (hard-negative mining, tokenizer prep) that sit on top of the
BM25 machinery in ``text_analysis.py`` and the cosine machinery in
``similarity.py``.

Both queries are oracle-checked bit-exact: the fused score is the
quantized-RRF integer (floor(SCALE/(K+rank)) per list — the same
quantize-before-compare discipline as the scaled BM25 family), and the
vocabulary coverage emits exact integer token counts instead of float
ratios.

Scale shape: each source ranking reduces to a driver-constant pool via
``orderBy().limit()`` (plans as TakeOrderedAndProject — distributed
partial top-k, no global sort); fusion then joins two POOL-row sets —
trivially broadcast at any corpus size.  The vocabulary count is one
map-side-combined groupBy on the token (uniformly distributed; Zipf
head skew is absorbed by partial aggregation since per-partition
combiners see at most |vocab| distinct keys).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from greenplum_dwh_spark.operators.text_analysis import (
    BM25_TERMS, _bm25_parts, _bm25_rational_scaled)
from greenplum_dwh_spark.sources.tpch import Tables

#: reciprocal-rank-fusion constant (Cormack & Clarke SIGIR'09 use 60)
RRF_K = 60
#: per-list candidate pool and fused result size
FUSE_POOL = 20
FUSE_TOP = 10
#: fixed-point scale for the quantized RRF addend floor(SCALE/(K+r)):
#: 10^12 keeps distinct pool ranks distinct after flooring and the
#: two-list sum far below 2^63
RRF_SCALE = 1_000_000_000_000

#: the semantic query: corpus vector 0 plays the embedded query text
QUERY_VEC = 0


def _rrf_addend(rank_col):
    return F.coalesce(
        F.expr(f"CAST({RRF_SCALE} AS BIGINT) DIV "
               f"({RRF_K} + {rank_col})"),
        F.lit(0).cast("long"))


def rank_fusion_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion of a lexical (BM25) and a semantic
    (embedding-cosine) ranking over the same corpus ids — the standard
    hybrid-retrieval combiner (Cormack & Clarke 2009) used for
    hard-negative mining and RAG candidate generation.

    Each list contributes floor(SCALE/(K+rank)) for its top
    :data:`FUSE_POOL` entries (0 for docs absent from a list, i.e. RRF
    over the union of the pools); the fused ranking orders by the
    integer sum, ties by doc id.  Quantizing each addend BEFORE the sum
    makes every arithmetic step BIGINT, so ranking AND score are
    hash-checked against the oracle — same discipline as
    ``text_bm25_topk_ranks``.

    Returns (doc_id, fused_rank, rrf_scaled, lex_rank, sem_rank) for
    the top :data:`FUSE_TOP`; list ranks are NULL for a doc the other
    list contributed alone."""
    t = Tables(spark, sf_dir)
    # lexical pool: quantized-rational BM25 over the static query terms
    lex_w = Window.orderBy(F.desc("score_scaled"), F.asc("doc_id"))
    lex = (_bm25_rational_scaled(_bm25_parts(t.documents, BM25_TERMS))
           .groupBy("doc_id")
           .agg(F.sum("s_scaled").alias("score_scaled"))
           .orderBy(F.desc("score_scaled"), F.asc("doc_id"))
           .limit(FUSE_POOL)
           .withColumn("lex_rank",
                       F.row_number().over(lex_w).cast("int"))
           .select("doc_id", "lex_rank"))
    # semantic pool: cosine of every corpus vector vs the query vector
    dot = ("aggregate(zip_with({a}, {b}, (x, y) -> "
           "cast(x as double) * cast(y as double)), "
           "cast(0.0 as double), (acc, v) -> acc + v)")
    q = (t.embeddings.filter(F.col("vec_id") == QUERY_VEC)
         .select(F.col("embedding").alias("q_emb"),
                 F.expr("sqrt(" + dot.format(a="embedding", b="embedding")
                        + ")").alias("q_norm")))
    sem_w = Window.orderBy(F.desc("cosine"), F.asc("vec_id"))
    sem = (t.embeddings.filter(F.col("vec_id") != QUERY_VEC)
           .crossJoin(F.broadcast(q))
           .select("vec_id",
                   (F.expr(dot.format(a="embedding", b="q_emb"))
                    / (F.expr("sqrt("
                              + dot.format(a="embedding", b="embedding")
                              + ")") * F.col("q_norm"))).alias("cosine"))
           .orderBy(F.desc("cosine"), F.asc("vec_id"))
           .limit(FUSE_POOL)
           .withColumn("sem_rank",
                       F.row_number().over(sem_w).cast("int"))
           .select(F.col("vec_id").alias("doc_id"), "sem_rank"))
    fused = (lex.join(sem, "doc_id", "full")
             .select("doc_id", "lex_rank", "sem_rank",
                     (_rrf_addend("lex_rank")
                      + _rrf_addend("sem_rank")).alias("rrf_scaled")))
    out_w = Window.orderBy(F.desc("rrf_scaled"), F.asc("doc_id"))
    return (fused.orderBy(F.desc("rrf_scaled"), F.asc("doc_id"))
            .limit(FUSE_TOP)
            .withColumn("fused_rank",
                        F.row_number().over(out_w).cast("int"))
            .select("doc_id", "fused_rank", "rrf_scaled",
                    "lex_rank", "sem_rank"))


#: vocabulary size for the coverage profile
VOCAB_TOP = 100


def vocab_topk_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequency-ranked vocabulary head with cumulative-coverage
    integers — the tokenizer-construction profile (what fraction of
    corpus token occurrences a size-V vocabulary covers; everything
    else becomes OOV/byte-fallback).

    Emits (rank, tok, n, cum_n, total_tokens): coverage at rank r is
    cum_n/total_tokens, left as exact integers so the comparison needs
    no float division.  The cumulative window runs over the top-V rows
    ONLY (post-reduction, V = driver constant) — the corpus-sized work
    is one map-side-combined groupBy plus a TakeOrderedAndProject."""
    t = Tables(spark, sf_dir)
    counts = (t.documents
              .select(F.explode(F.split("text", " ")).alias("tok"))
              .groupBy("tok")
              .agg(F.count(F.lit(1)).alias("n")))
    total = counts.agg(F.sum("n").alias("total_tokens"))
    w = Window.orderBy(F.desc("n"), F.asc("tok"))
    return (counts.orderBy(F.desc("n"), F.asc("tok")).limit(VOCAB_TOP)
            .withColumn("rank", F.row_number().over(w).cast("int"))
            .withColumn("cum_n",
                        F.sum("n").over(w.rowsBetween(
                            Window.unboundedPreceding,
                            Window.currentRow)))
            .crossJoin(F.broadcast(total))
            .select("rank", "tok", "n", "cum_n", "total_tokens"))


QUERIES = {
    "rank_fusion_rrf": rank_fusion_rrf,
    "vocab_topk_coverage": vocab_topk_coverage,
}

_DOT_SQL = ("list_reduce(list_transform(range(1, 65), i -> "
            "{a}[i]::DOUBLE * {b}[i]::DOUBLE), (x, y) -> x + y)")

from greenplum_dwh_spark.operators.text_analysis import _BM25_SCALE

ORACLES = {
    "rank_fusion_rrf": f"""
        WITH terms AS (SELECT unnest(
                 [{', '.join(repr(t) for t in BM25_TERMS)}]) AS term),
        docs AS (SELECT doc_id, len(string_split(text, ' ')) AS dl,
                        string_split(text, ' ') AS toks
                 FROM documents),
        stats AS (SELECT count(*)::BIGINT AS n_docs,
                         sum(dl)::BIGINT AS total_len
                  FROM docs),
        ex AS (SELECT d.doc_id, d.dl, unnest(d.toks) AS tok FROM docs d),
        hits AS (SELECT doc_id, dl, tok, count(*)::BIGINT AS tf
                 FROM ex WHERE tok IN (SELECT term FROM terms)
                 GROUP BY 1, 2, 3),
        dfc AS (SELECT tok, count(DISTINCT doc_id)::BIGINT AS df
                FROM ex WHERE tok IN (SELECT term FROM terms)
                GROUP BY tok),
        per_term AS (
          SELECT h.doc_id,
                 (22::BIGINT * h.tf * s.total_len
                    * (2 * s.n_docs - 2 * f.df + 1)
                    * {_BM25_SCALE})
                 // ((2 * f.df + 1)
                     * (10 * h.tf * s.total_len + 3 * s.total_len
                        + 9 * h.dl * s.n_docs)) AS s_scaled
          FROM hits h JOIN dfc f USING (tok) CROSS JOIN stats s),
        lex_all AS (SELECT doc_id, sum(s_scaled)::BIGINT AS score_scaled
                    FROM per_term GROUP BY doc_id),
        lex AS (SELECT doc_id, rank FROM (
                  SELECT doc_id, row_number() OVER (
                      ORDER BY score_scaled DESC, doc_id) AS rank
                  FROM lex_all) WHERE rank <= {FUSE_POOL}),
        n AS (SELECT vec_id, embedding,
              sqrt({_DOT_SQL.format(a='embedding', b='embedding')}) AS nrm
              FROM embeddings),
        q AS (SELECT embedding AS q_emb, nrm AS q_norm FROM n
              WHERE vec_id = {QUERY_VEC}),
        sem_scored AS (SELECT c.vec_id,
                 {_DOT_SQL.format(a='c.embedding', b='q.q_emb')}
                     / (c.nrm * q.q_norm) AS cosine
              FROM n c CROSS JOIN q WHERE c.vec_id != {QUERY_VEC}),
        sem AS (SELECT vec_id AS doc_id, rank FROM (
                  SELECT vec_id, row_number() OVER (
                      ORDER BY cosine DESC, vec_id) AS rank
                  FROM sem_scored) WHERE rank <= {FUSE_POOL}),
        fused AS (
          SELECT coalesce(lex.doc_id, sem.doc_id) AS doc_id,
                 lex.rank::INT AS lex_rank, sem.rank::INT AS sem_rank,
                 (coalesce({RRF_SCALE}::BIGINT // ({RRF_K} + lex.rank), 0)
                  + coalesce({RRF_SCALE}::BIGINT // ({RRF_K} + sem.rank),
                             0))::BIGINT AS rrf_scaled
          FROM lex FULL OUTER JOIN sem ON lex.doc_id = sem.doc_id),
        rk AS (SELECT *, row_number() OVER (
                   ORDER BY rrf_scaled DESC, doc_id) AS fused_rank
               FROM fused)
        SELECT doc_id, fused_rank::INT AS fused_rank, rrf_scaled,
               lex_rank, sem_rank
        FROM rk WHERE fused_rank <= {FUSE_TOP}""",
    "vocab_topk_coverage": f"""
        WITH counts AS (
          SELECT tok, count(*)::BIGINT AS n FROM (
            SELECT unnest(string_split(text, ' ')) AS tok
            FROM documents) GROUP BY tok),
        total AS (SELECT sum(n)::BIGINT AS total_tokens FROM counts),
        rk AS (SELECT tok, n,
                      row_number() OVER (ORDER BY n DESC, tok) AS rank,
                      sum(n) OVER (ORDER BY n DESC, tok
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND CURRENT ROW)::BIGINT AS cum_n
               FROM counts)
        SELECT rank::INT AS rank, tok, n, cum_n, t.total_tokens
        FROM rk CROSS JOIN total t
        WHERE rank <= {VOCAB_TOP}""",
}
