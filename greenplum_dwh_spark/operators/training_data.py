"""Training-data pipeline operators over the ``documents`` and
``embeddings`` corpora: deterministic stratified sampling, PII
scrubbing, canonicalization dedup, per-group top-k selection,
higher-order array functions, and positional token explosion.

These complement the dedup/similarity/text families (``dedup.py``,
``similarity.py``, ``text_analysis.py``) with the remaining verbs a
100 TB curation pipeline runs between ingest and tokenization.  All
six queries are oracle-checked bit-exact against DuckDB.

Portability rules used here:

- sampling decisions hash ``md5(doc_id)`` (identical hex in Spark and
  DuckDB) — never engine-local ``rand(seed)``, whose stream is not
  portable and, at scale, not even stable across partitionings;
- regexes avoid alternation and backreferences so Java's
  leftmost-first and RE2-style leftmost-longest matching agree;
- float math is forced through double with explicit casts and
  ``floor`` scaling (no ties, unlike round-half cases).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from greenplum_dwh_spark.sources.tpch import Tables

#: Per-language keep-rate (basis points of the 10k hash space):
#: downsample the dominant language, keep the rest — the standard
#: rebalancing move before tokenizer training.
_SAMPLE_BPS = {"en": 2000, "zh": 8000, "fr": 8000, "de": 8000, "es": 8000}

_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
_PHONE_RE = r"\+\d{1,2}-\d{3}-\d{4}"


def _hash_bucket(col):
    """Uniform bucket in [0, 10000); the shared recipe lives in
    :func:`greenplum_dwh_spark.functions.hashing.md5_bucket` so the
    sampling/split/shard derivations can never silently diverge."""
    from greenplum_dwh_spark.functions.hashing import md5_bucket
    return md5_bucket(col, 10000)


# ---------------------------------------------------------------------------
# Deterministic stratified sampling.  One narrow filter — no shuffle at
# all: the decision is a pure function of the row, so at 100 TB this is
# a map-only scan with the filter pushed into the parquet reader's
# residual.  Reproducible across runs, partitionings, and engines.
def sample_hash_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    rate = F.coalesce(
        *[F.when(F.col("lang") == k, F.lit(v))
          for k, v in _SAMPLE_BPS.items()],
        F.lit(5000))
    return (t.documents
            .withColumn("bucket", _hash_bucket(F.col("doc_id")))
            .filter(F.col("bucket") < rate)
            .select("doc_id", "lang", "source", "bucket"))


# ---------------------------------------------------------------------------
# PII scrubbing.  The synthetic corpus carries no PII, so the query
# first *plants* it deterministically from doc_id (email, IPv4, phone),
# then scrubs — the substitution path is exercised for real and the
# oracle replays the identical plant+scrub.  Map-only: regex work is
# JVM-side codegen, no Python, no shuffle.
def scrub_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    planted = F.concat(
        F.col("text"), F.lit(" contact user"), F.col("doc_id"),
        F.lit("@example.com from 10.0."), F.col("doc_id") % 256,
        F.lit(".7 call +1-555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"))
    scrubbed = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(planted, _EMAIL_RE, "<EMAIL>"),
            _IPV4_RE, "<IP>"),
        _PHONE_RE, "<PHONE>")
    return (t.documents.select(
        "doc_id",
        F.regexp_count(planted, F.lit(_EMAIL_RE)).alias("n_emails"),
        F.regexp_count(planted, F.lit(_IPV4_RE)).alias("n_ips"),
        scrubbed.alias("scrubbed")))


# ---------------------------------------------------------------------------
# Canonicalization dedup: lowercase, strip non-alphanumerics, collapse
# whitespace, then group by the canonical form — the cheap normalizing
# pass that runs before MinHash.  One groupBy on the canonical digest
# (shuffle key is a fixed-width md5, skew-free unless the corpus has a
# true mega-duplicate, which is exactly what n_docs surfaces).
def canon_text_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    canon = F.trim(F.regexp_replace(
        F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", ""),
        " +", " "))
    return (t.documents.select(F.md5(canon).alias("canon_key"), "doc_id")
            .groupBy("canon_key")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.min("doc_id").alias("keeper_doc_id")))


# ---------------------------------------------------------------------------
# Per-group top-k (largest documents per language) — the window+filter
# idiom.  Unlike global top-k (which plans as TakeOrderedAndProject,
# see text_analysis.bm25_topk), per-group top-k genuinely needs the
# window; partitioning by the group key keeps it one exchange, and
# with rank ≤ k the post-filter drops all but k rows per group early.
def topk_docs_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    w = Window.partitionBy("lang").orderBy(
        F.col("n_chars").desc(), F.col("doc_id"))
    return (t.documents
            .select("lang", "doc_id", "n_chars",
                    F.row_number().over(w).alias("rk"))
            .filter(F.col("rk") <= 3))


# ---------------------------------------------------------------------------
# Higher-order array functions over embeddings, integer-exact:
# transform→aggregate for a scaled squared norm, filter for sign
# counts.  All lambda work is codegen'd JVM-side (no UDF); floor of a
# double is tie-free, so the oracle matches bit-exactly despite float
# inputs.
def embedding_hof_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return t.embeddings.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.expr(
            "aggregate(transform(embedding,"
            " v -> CAST(floor(CAST(v AS DOUBLE) * 1000000.0) AS BIGINT)),"
            " CAST(0 AS BIGINT), (a, v) -> a + v * v)").alias("norm_sq_u"),
        F.expr("size(filter(embedding, v -> v > 0))").alias("n_pos"),
        F.expr("size(filter(embedding, v -> v < 0))").alias("n_neg"))


# ---------------------------------------------------------------------------
# Positional token explosion (LATERAL VIEW posexplode) — the fan-out
# that feeds n-gram/shingle builders.  Explode is pipelined inside the
# scan stage (no shuffle); output order is irrelevant because position
# is materialized as data.
def tokens_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return (t.documents
            .select("doc_id", F.posexplode(F.split("text", " "))
                    .alias("pos0", "token"))
            .select("doc_id", (F.col("pos0") + 1).alias("pos"), "token"))


# ---------------------------------------------------------------------------
# Blocked fuzzy matching: candidate pairs share a cheap blocking key
# (lang + length bucket), then an edit-distance verify on a fixed-size
# prefix.  The blocked equi-join is the scale story — Σ block² work
# instead of n², with the block key chosen so blocks stay small (skew
# in a block is visible as its size; re-block or salt if one explodes).
# Levenshtein is O(m·n) per pair, so it runs only on the blocked
# candidates, never all pairs.
FUZZY_PREFIX = 40
FUZZY_MAX_DIST = 12


def fuzzy_doc_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    d = t.documents.select(
        "doc_id", "lang",
        (F.col("n_chars") / 8).cast("long").alias("blk"),
        F.substring("text", 1, FUZZY_PREFIX).alias("pre"))
    a = d.select(*[F.col(c).alias(f"a_{c}") for c in d.columns])
    b = d.select(*[F.col(c).alias(f"b_{c}") for c in d.columns])
    return (a.join(b, (F.col("a_lang") == F.col("b_lang"))
                   & (F.col("a_blk") == F.col("b_blk"))
                   & (F.col("a_doc_id") < F.col("b_doc_id")))
            .select(F.col("a_doc_id").alias("doc_a"),
                    F.col("b_doc_id").alias("doc_b"),
                    F.levenshtein("a_pre", "b_pre").alias("edit_dist"))
            .filter(F.col("edit_dist") <= FUZZY_MAX_DIST))


# ---------------------------------------------------------------------------
# Deterministic negative sampling for contrastive training: for each
# anchor document, K negatives drawn uniformly (without replacement)
# from the differently-labeled corpus slice, selected by ranking
# candidates on md5(anchor || ':' || candidate) — a reproducible,
# partitioning-independent stand-in for rand() sampling, and the same
# portability recipe the split/sample operators use.
#
# Scale shape: the anchor set is the small slice (eval anchors are a
# fixed fraction of the corpus), broadcast against the candidate scan;
# the per-anchor top-K is a window over the anchor key, so the only
# exchange is on anchor_id.  The candidate pool is PRE-SLICED to a
# hash bucket (md5_bucket(doc_id) < NEG_POOL_BPS, default on per the
# round-3 verdict) so the ranked set per anchor is
# corpus-fraction-sized — a pushed-down map-side filter, the same
# shared md5_bucket recipe as sample_hash_stratified, which the
# oracle replays verbatim.  Within the pool the selection is still
# exact uniform-without-replacement (the md5 ranking key is
# independent of the pool-membership hash: different input strings).
# ``pool_bps=None`` keeps the full corpus as the pool — the
# ground-truth variant the unit test pins against the sliced one.
NEG_K = 4
NEG_ANCHOR_MOD = 97
NEG_POOL_BPS = 2500


def contrastive_negatives(spark: SparkSession, sf_dir: str,
                          pool_bps: int | None = NEG_POOL_BPS
                          ) -> DataFrame:
    t = Tables(spark, sf_dir)
    anchors = (t.documents
               .filter(F.col("doc_id") % NEG_ANCHOR_MOD == 0)
               .select(F.col("doc_id").alias("anchor_id"),
                       F.col("lang").alias("anchor_lang")))
    pool = t.documents.select("doc_id", "lang")
    if pool_bps is not None:
        pool = pool.filter(_hash_bucket(F.col("doc_id")) < pool_bps)
    key = F.md5(F.concat_ws(":", F.col("anchor_id").cast("string"),
                            F.col("doc_id").cast("string")))
    w = Window.partitionBy("anchor_id").orderBy("sel_key", "doc_id")
    return (pool
            .crossJoin(F.broadcast(anchors))
            .filter(F.col("lang") != F.col("anchor_lang"))
            .withColumn("sel_key", key)
            .withColumn("neg_rank", F.row_number().over(w).cast("int"))
            .filter(F.col("neg_rank") <= NEG_K)
            .select("anchor_id", F.col("doc_id").alias("neg_id"),
                    "neg_rank", F.col("lang").alias("neg_lang")))


# ---------------------------------------------------------------------------
# Dataset-mixture re-weighting: given per-source token masses, the
# per-source sampling rate that equalizes each source's contribution
# to the training mix (the "mixture math" step before sample_* runs).
# rate = min(1, target_tokens / source_tokens) with a uniform target
# of total/n_sources, emitted as exact integer parts-per-million:
# every step is BIGINT (two aggregations over a handful of rows after
# the one corpus-sized token count — the reduce side is |sources|).
def mixture_sampling_rates(spark: SparkSession,
                           sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    per_src = (t.documents
               .select("source",
                       F.size(F.split("text", " ")).alias("n"))
               .groupBy("source")
               .agg(F.sum("n").cast("long").alias("n_tokens")))
    totals = per_src.agg(
        F.sum("n_tokens").alias("total_tokens"),
        F.count(F.lit(1)).alias("n_sources"))
    return (per_src.crossJoin(F.broadcast(totals))
            .select("source", "n_tokens", "total_tokens", "n_sources",
                    F.least(
                        F.lit(1_000_000).cast("long"),
                        F.expr("CAST(1000000 AS BIGINT) * total_tokens"
                               " DIV (n_sources * n_tokens)"))
                    .alias("rate_ppm")))


QUERIES = {
    "mixture_sampling_rates": mixture_sampling_rates,
    "contrastive_negatives": contrastive_negatives,
    "sample_hash_stratified": sample_hash_stratified,
    "scrub_pii": scrub_pii,
    "canon_text_dedup": canon_text_dedup,
    "topk_docs_per_lang": topk_docs_per_lang,
    "embedding_hof_norms": embedding_hof_norms,
    "tokens_posexplode": tokens_posexplode,
    "fuzzy_doc_pairs": fuzzy_doc_pairs,
}

_CASE_BPS = ("CASE lang WHEN 'en' THEN 2000 WHEN 'zh' THEN 8000 "
             "WHEN 'fr' THEN 8000 WHEN 'de' THEN 8000 WHEN 'es' THEN 8000 "
             "ELSE 5000 END")

_PLANTED = ("text || ' contact user' || doc_id || '@example.com from 10.0.'"
            " || (doc_id % 256) || '.7 call +1-555-'"
            " || lpad((doc_id % 10000)::VARCHAR, 4, '0')")

ORACLES = {
    "mixture_sampling_rates": """
        WITH per_src AS (
          SELECT source,
                 sum(len(string_split(text, ' ')))::BIGINT AS n_tokens
          FROM documents GROUP BY source),
        totals AS (SELECT sum(n_tokens)::BIGINT AS total_tokens,
                          count(*)::BIGINT AS n_sources FROM per_src)
        SELECT source, n_tokens, t.total_tokens, t.n_sources,
               least(1000000::BIGINT,
                     (1000000::BIGINT * t.total_tokens)
                     // (t.n_sources * n_tokens)) AS rate_ppm
        FROM per_src CROSS JOIN totals t""",
    "contrastive_negatives": f"""
        WITH anchors AS (SELECT doc_id AS anchor_id, lang AS anchor_lang
                         FROM documents
                         WHERE doc_id % {NEG_ANCHOR_MOD} = 0),
        pool AS (SELECT doc_id, lang FROM documents
                 WHERE ('0x' || substr(md5(doc_id::VARCHAR), 1, 6))::BIGINT
                       % 10000 < {NEG_POOL_BPS}),
        cand AS (SELECT a.anchor_id, d.doc_id AS neg_id, d.lang,
                        md5(a.anchor_id::VARCHAR || ':'
                            || d.doc_id::VARCHAR) AS sel_key
                 FROM pool d CROSS JOIN anchors a
                 WHERE d.lang <> a.anchor_lang),
        rk AS (SELECT anchor_id, neg_id, lang,
                      row_number() OVER (PARTITION BY anchor_id
                          ORDER BY sel_key, neg_id) AS neg_rank
               FROM cand)
        SELECT anchor_id, neg_id, neg_rank::INT AS neg_rank,
               lang AS neg_lang
        FROM rk WHERE neg_rank <= {NEG_K}""",
    "sample_hash_stratified": f"""
        WITH d AS (
          SELECT doc_id, lang, source,
                 ('0x' || substr(md5(doc_id::VARCHAR), 1, 6))::BIGINT % 10000
                     AS bucket
          FROM documents)
        SELECT doc_id, lang, source, bucket
        FROM d WHERE bucket < {_CASE_BPS}""",
    "scrub_pii": f"""
        WITH p AS (SELECT doc_id, {_PLANTED} AS planted FROM documents)
        SELECT doc_id,
               len(regexp_extract_all(planted,
                   '{_EMAIL_RE}'))::INT AS n_emails,
               len(regexp_extract_all(planted,
                   '{_IPV4_RE}'))::INT AS n_ips,
               regexp_replace(regexp_replace(regexp_replace(planted,
                   '{_EMAIL_RE}', '<EMAIL>', 'g'),
                   '{_IPV4_RE}', '<IP>', 'g'),
                   '{_PHONE_RE}', '<PHONE>', 'g') AS scrubbed
        FROM p""",
    "canon_text_dedup": """
        WITH c AS (
          SELECT doc_id,
                 md5(trim(regexp_replace(regexp_replace(lower(text),
                     '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS canon_key
          FROM documents)
        SELECT canon_key, count(*) AS n_docs,
               min(doc_id) AS keeper_doc_id
        FROM c GROUP BY canon_key""",
    "topk_docs_per_lang": """
        SELECT lang, doc_id, n_chars, rk FROM (
          SELECT lang, doc_id, n_chars,
                 row_number() OVER (PARTITION BY lang
                     ORDER BY n_chars DESC, doc_id) AS rk
          FROM documents) WHERE rk <= 3""",
    "embedding_hof_norms": """
        SELECT vec_id,
               len(embedding)::INT AS dim,
               list_reduce(list_prepend(0::BIGINT,
                   list_transform(embedding,
                       v -> floor(v::DOUBLE * 1000000.0)::BIGINT)),
                   (a, v) -> a + v * v)::BIGINT AS norm_sq_u,
               len(list_filter(embedding, v -> v > 0))::INT AS n_pos,
               len(list_filter(embedding, v -> v < 0))::INT AS n_neg
        FROM embeddings""",
    "tokens_posexplode": """
        WITH toks AS (SELECT doc_id, string_split(text, ' ') AS parts
                      FROM documents)
        SELECT doc_id,
               unnest(range(1, len(parts) + 1))::BIGINT AS pos,
               unnest(parts) AS token
        FROM toks""",
    "fuzzy_doc_pairs": f"""
        WITH d AS (
          SELECT doc_id, lang, n_chars // 8 AS blk,
                 substr(text, 1, {FUZZY_PREFIX}) AS pre
          FROM documents)
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               levenshtein(a.pre, b.pre)::INT AS edit_dist
        FROM d a JOIN d b
          ON a.lang = b.lang AND a.blk = b.blk AND a.doc_id < b.doc_id
        WHERE levenshtein(a.pre, b.pre) <= {FUZZY_MAX_DIST}""",
}
