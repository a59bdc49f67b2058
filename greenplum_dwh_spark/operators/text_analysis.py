"""Text-analysis operators for training-data pipelines: language-ID,
quality scoring, token counting, document fingerprinting.

All are single-pass, per-row (langid/quality/tokens) or one-shuffle
(fingerprint) Spark SQL expressions — linear scale-out, no UDFs.
Parity discipline: ratios are single double divisions of integer
ingredients; tie-breaks are deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from greenplum_dwh_spark.functions import hashing as H
from greenplum_dwh_spark.sources.tpch import Tables

#: stopword marker profiles for the n-gram/stopword language heuristic.
#: (The testdata corpus is a synthetic shared vocabulary, so predictions
#: mostly collapse to the tie-break — the operator contract is the
#: deterministic scoring itself, verified against the oracle.)
LANG_MARKERS = {
    "en": ["the", "a", "and", "of", "to", "in", "is"],
    "de": ["der", "die", "das", "und", "ist", "ein"],
    "es": ["el", "la", "los", "y", "es", "una"],
    "fr": ["le", "la", "les", "et", "est", "une"],
}

FINGERPRINT_K = 5  # k-min sketch size


def _score(toks, lang: str):
    arr = F.array(*[F.lit(w) for w in LANG_MARKERS[lang]])
    return F.size(F.array_intersect(toks, arr))


def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    toks = F.array_distinct(F.split("text", " "))
    d = t.documents.select(
        "doc_id", *[_score(toks, lg).alias(f"s_{lg}")
                    for lg in LANG_MARKERS])
    best = F.greatest(*[F.col(f"s_{lg}") for lg in LANG_MARKERS])
    pred = F.when(best == 0, F.lit("und"))
    for lg in sorted(LANG_MARKERS):  # deterministic lexicographic tie-break
        pred = pred.when(F.col(f"s_{lg}") == best, F.lit(lg))
    return d.select("doc_id", pred.alias("lang_pred"),
                    *[f"s_{lg}" for lg in LANG_MARKERS])


def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length / type-token-ratio quality score in [0, 1]."""
    t = Tables(spark, sf_dir)
    toks = F.split("text", " ")
    n_tok = F.size(toks)
    n_uniq = F.size(F.array_distinct(toks))
    nospace = F.length(F.regexp_replace("text", " ", ""))
    ttr = n_uniq.cast("double") / n_tok
    avg_len = nospace.cast("double") / n_tok
    score = 0.5 * ttr + 0.5 * F.least(F.lit(1.0),
                                      n_tok.cast("double") / 100.0)
    return t.documents.select(
        "doc_id", n_tok.alias("n_tokens"), n_uniq.alias("n_uniq_tokens"),
        ttr.alias("ttr"), avg_len.alias("avg_token_len"),
        score.alias("quality_score"))


def text_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace + BPE-ish regex token counts and byte/char lengths."""
    t = Tables(spark, sf_dir)
    return t.documents.select(
        "doc_id",
        F.size(F.split("text", " ")).alias("ws_tokens"),
        F.size(F.regexp_extract_all("text", F.lit("[a-z0-9]+"), 0))
        .alias("re_tokens"),
        F.length("text").alias("n_chars_measured"),
        F.octet_length("text").alias("n_bytes"))


def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-min sketch fingerprint: md5 over the 5 smallest shingle-hash
    values — a compact rolling-hash-family document signature usable as
    a near-dup blocking key."""
    t = Tables(spark, sf_dir)
    ex = (H.with_word_shingles(t.documents)
          .select("doc_id", F.explode("s").alias("sh"))
          .select("doc_id", F.md5("sh").alias("hh")))
    return (ex.groupBy("doc_id")
            .agg(F.md5(F.concat_ws(
                "", F.slice(F.array_sort(F.collect_set("hh")), 1,
                            FINGERPRINT_K))).alias("fingerprint")))


def text_term_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc top term by frequency (tie-break lexicographic) with its
    corpus document frequency — the integer-exact core of tf-idf
    (scores stay downstream so parity holds without float logs)."""
    t = Tables(spark, sf_dir)
    ex = (t.documents
          .select("doc_id", F.explode(F.split("text", " ")).alias("tok")))
    tf = ex.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    from pyspark.sql import Window
    w = Window.partitionBy("doc_id").orderBy(F.desc("tf"), F.asc("tok"))
    top = (tf.withColumn("rk", F.row_number().over(w))
           .filter(F.col("rk") == 1).drop("rk"))
    df_counts = (ex.select("doc_id", "tok").distinct()
                 .groupBy("tok").agg(F.count(F.lit(1)).alias("df")))
    return (top.join(df_counts, "tok")
            .select("doc_id", F.col("tok").alias("top_term"), "tf", "df"))


#: static retrieval query terms (present across the synthetic corpus);
#: BM25 constants k1=1.2=6/5, b=0.75=3/4 — the rational forms below.
BM25_TERMS = ["hash", "join", "filter"]
BM25_TOP_K = 10
_BM25_SCALE = 10_000  # fixed-point scale for the integer-exact score


def _corpus_stats(docs: DataFrame) -> DataFrame:
    """One-row (n_docs, total_len) for broadcast into the scorers."""
    return (docs.select(F.size(F.split("text", " ")).alias("dl"))
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("dl").alias("total_len")))


def _bm25_parts(docs: DataFrame, terms: list[str]) -> DataFrame:
    """(doc_id, tok, tf, dl, df, n_docs, total_len) for the query terms.

    tf is per (doc, term); df is the term's corpus document frequency;
    dl the doc's whitespace token count. One shuffle for tf, one for
    df (broadcast back), stats broadcast — the standard inverted-index
    build restricted to the query vocabulary, which is exactly what a
    posting-list scan does at scale."""
    ex = (docs.select("doc_id",
                      F.size(F.split("text", " ")).alias("dl"),
                      F.explode(F.split("text", " ")).alias("tok"))
          .filter(F.col("tok").isin(terms)))
    tf = (ex.groupBy("doc_id", "dl", "tok")
          .agg(F.count(F.lit(1)).alias("tf")))
    dfc = (ex.select("doc_id", "tok").distinct()
           .groupBy("tok").agg(F.count(F.lit(1)).alias("df")))
    return (tf.join(F.broadcast(dfc), "tok")
            .crossJoin(F.broadcast(_corpus_stats(docs))))


def text_bm25_scaled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer-exact BM25 ranked retrieval, one ranking per query term.

    With k1=6/5, b=3/4 and avgdl = L/N, the per-term BM25 score is the
    exact rational

        (2N−2df+1)·22·tf·L
        ------------------------------------
        (2df+1)·(10·tf·L + 3L + 9·dl·N)

    (idf in the (N−df+0.5)/(df+0.5) rational form — for a single-term
    ranking idf is a per-term constant, so the ranking equals true
    ln-idf BM25). The emitted score is floor(num·SCALE/den): pure
    BIGINT arithmetic, bit-identical in Spark and DuckDB, so the
    ranking is oracle-checked exactly — no float logs
    (ln-BM25 with multi-term sums is text_bm25_topk, tolerance-tested).
    Magnitudes: num·SCALE ≤ 22·54·L·2N·10⁴ stays under 2⁶³ through
    corpus sizes of ~50k docs; beyond that lift SCALE into DECIMAL(38).
    """
    parts = _bm25_parts(Tables(spark, sf_dir).documents, BM25_TERMS)
    b = lambda c: c.cast("long")
    num = (b(F.lit(22)) * b(F.col("tf")) * b(F.col("total_len"))
           * (b(F.lit(2)) * b(F.col("n_docs"))
              - b(F.lit(2)) * b(F.col("df")) + b(F.lit(1))))
    den = ((b(F.lit(2)) * b(F.col("df")) + b(F.lit(1)))
           * (b(F.lit(10)) * b(F.col("tf")) * b(F.col("total_len"))
              + b(F.lit(3)) * b(F.col("total_len"))
              + b(F.lit(9)) * b(F.col("dl")) * b(F.col("n_docs"))))
    scored = parts.select(
        F.col("tok").alias("term"), "doc_id", "tf",
        F.col("dl").cast("int").alias("dl"), "df",
        (num * F.lit(_BM25_SCALE)).cast("long").alias("_num"),
        den.alias("_den"))
    from pyspark.sql import Window
    w = Window.partitionBy("term").orderBy(
        F.desc(F.expr("_num DIV _den")), F.asc("doc_id"))
    return (scored
            .withColumn("score_scaled", F.expr("_num DIV _den"))
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= BM25_TOP_K)
            .select("term", "doc_id", "rank", "tf", "dl", "df",
                    "score_scaled"))


def _bm25_rational_scaled(parts: DataFrame) -> DataFrame:
    """Per-(doc, term) integer-exact scaled BM25-rational score:
    ``floor(SCALE · num/den)`` with the k1=6/5, b=3/4 rational from
    :func:`text_bm25_scaled` — pure BIGINT arithmetic, bit-identical
    in Spark and DuckDB."""
    b = lambda c: c.cast("long")
    num = (b(F.lit(22)) * b(F.col("tf")) * b(F.col("total_len"))
           * (b(F.lit(2)) * b(F.col("n_docs"))
              - b(F.lit(2)) * b(F.col("df")) + b(F.lit(1))))
    den = ((b(F.lit(2)) * b(F.col("df")) + b(F.lit(1)))
           * (b(F.lit(10)) * b(F.col("tf")) * b(F.col("total_len"))
              + b(F.lit(3)) * b(F.col("total_len"))
              + b(F.lit(9)) * b(F.col("dl")) * b(F.col("n_docs"))))
    return parts.select(
        "doc_id",
        (num * F.lit(_BM25_SCALE)).cast("long").alias("_num"),
        den.alias("_den")).withColumn(
            "s_scaled", F.expr("_num DIV _den")).drop("_num", "_den")


def text_bm25_topk_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-term BM25 top-k with an ORACLE-EXACT ranking: the per-doc
    score is the sum over matched query terms of the integer-scaled
    rational per-term score (idf in its (N−df+0.5)/(df+0.5) rational
    form, quantized to :data:`_BM25_SCALE` *before* the sum).  Unlike
    the float-log ``text_bm25_topk``, every arithmetic step is BIGINT —
    the driver hash-checks ranking AND score.  The quantized rational
    ranking is a documented scoring-function variant (ln replaced by
    its monotone rational argument), not an approximation of the ln
    ranking; both are shipped.  Plans as TakeOrderedAndProject —
    distributed partial top-k, no global window shuffle."""
    parts = _bm25_parts(Tables(spark, sf_dir).documents, BM25_TERMS)
    top = (_bm25_rational_scaled(parts)
           .groupBy("doc_id")
           .agg(F.sum("s_scaled").alias("score_scaled"))
           .orderBy(F.desc("score_scaled"), F.asc("doc_id"))
           .limit(BM25_TOP_K))
    from pyspark.sql import Window
    w = Window.orderBy(F.desc("score_scaled"), F.asc("doc_id"))
    return (top.withColumn("rank", F.row_number().over(w))
            .select("doc_id", F.col("rank").cast("int").alias("rank"),
                    "score_scaled"))


def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """True ln-idf BM25 over the multi-term query set: per-doc score is
    the sum over matched query terms of

        ln(1 + (N−df+0.5)/(df+0.5)) · tf·(k1+1)/(tf + k1(1−b+b·dl/avgdl))

    Float logs are not ulp-stable across engines → rows-only for the
    driver; the ranking is tolerance-tested against an independent
    pandas model in tests."""
    parts = _bm25_parts(Tables(spark, sf_dir).documents, BM25_TERMS)
    d = lambda c: c.cast("double")
    idf = F.log(F.lit(1.0)
                + (d(F.col("n_docs")) - d(F.col("df")) + 0.5)
                / (d(F.col("df")) + 0.5))
    avgdl = d(F.col("total_len")) / d(F.col("n_docs"))
    tf_part = (d(F.col("tf")) * 2.2
               / (d(F.col("tf"))
                  + 1.2 * (0.25 + 0.75 * d(F.col("dl")) / avgdl)))
    per_term = parts.select(
        "doc_id", (idf * tf_part).alias("s"))
    # orderBy+limit plans as TakeOrderedAndProject (distributed partial
    # top-k, no single-partition window shuffle); rank is then assigned
    # over the K surviving rows only
    top = (per_term.groupBy("doc_id")
           .agg(F.sum("s").alias("score"))
           .orderBy(F.desc("score"), F.asc("doc_id"))
           .limit(BM25_TOP_K))
    from pyspark.sql import Window
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return (top.withColumn("rank", F.row_number().over(w))
            .select("doc_id", "rank", "score"))


# Intra-document repetition (Gopher/RefinedWeb-style quality signal):
# the fraction of word 2-grams that are repeats of an earlier 2-gram
# in the same document.  High values flag boilerplate/spam before any
# cross-document dedup runs.  Pure array expressions inside codegen —
# no explode, no shuffle: the whole query is a map-only scan.
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    grams = ("transform(sequence(0, greatest(size(toks) - 2, 0)), "
             "i -> array_join(slice(toks, i + 1, 2), ' '))")
    return (t.documents
            .select("doc_id", F.split("text", " ").alias("toks"))
            .select("doc_id",
                    F.expr(f"size({grams})").alias("total_2grams"),
                    F.expr(f"size(array_distinct({grams}))")
                    .alias("distinct_2grams"))
            .withColumn("rep_frac",
                        1.0 - (F.col("distinct_2grams").cast("double")
                               / F.col("total_2grams"))))


# Corpus-level duplicated-n-gram fraction (the cross-document member
# of the Gopher/MassiveText duplication rule family; text_repetition
# above is the intra-document one): for each document, how much of
# its word-3-gram mass also occurs in at least one OTHER document.
# High values flag template/boilerplate-heavy docs that survive
# exact-dedup because no two are whole-document identical — the
# signal CCNet-style pipelines compute at paragraph granularity.
#
# Scale shape: one map-only gram explode, then three exchanges, each
# over data the previous stage already shrank — (doc, gram) partial
# counts (map-side combined), the gram-keyed doc-frequency aggregate
# joined back to the per-doc-distinct gram table, and the final
# per-doc rollup.  The corpus-duplication tag is an AGGREGATE + JOIN,
# deliberately not a window over gram: a stop-gram at corpus scale
# puts every doc containing it in ONE window partition (a single
# task), while the equivalent shuffle join is partially combined on
# the agg side and AQE skew-splittable on the probe side.  No join
# carries raw text; at 100 TB the gram string would ride as xxhash64
# (the dedup-family recipe) — kept verbatim here so the DuckDB oracle
# replays it exactly.
DUP_NGRAM_N = 3


def dup_ngram_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dup_ngram_mass(Tables(spark, sf_dir).documents)


def dup_ngram_mass(docs: DataFrame,
                   caches: list | None = None) -> DataFrame:
    """DataFrame-verb form (used by the curation funnel): per doc,
    total 3-gram mass, the mass also present in ≥1 other doc, and the
    duplicated share in basis points.

    The plan pins a corpus-sized (doc, gram) cache (see the inline
    comment).  A caller that consumes the result WITHIN one stage —
    the funnel materializes its id cut and moves on — should pass a
    ``caches`` list and unpersist its entries afterwards, or the
    cache outlives its one useful stage and squats on executor
    storage for the rest of the session."""
    n = DUP_NGRAM_N
    grams = (f"transform(sequence(1, size(toks) - {n - 1}), "
             f"i -> array_join(slice(toks, i, {n}), ' '))")
    per = (docs
           .select("doc_id", F.split("text", " ").alias("toks"))
           .filter(F.size("toks") >= n)
           .select("doc_id", F.explode(F.expr(grams)).alias("gram"))
           .groupBy("doc_id", "gram")
           .agg(F.count(F.lit(1)).alias("m"))
           # referenced by BOTH join sides below; without this the
           # explode+shuffle subtree runs twice (AQE stage reuse does
           # not fire across the agg/probe asymmetry — measured).  At
           # cluster scale use persist(DISK_ONLY) if the (doc, gram)
           # table outgrows executor memory.
           .cache())
    if caches is not None:
        caches.append(per)
    df_g = per.groupBy("gram").agg(F.count(F.lit(1)).alias("nd"))
    return (per.join(df_g, "gram")
            .groupBy("doc_id")
            .agg(F.sum("m").alias("n_grams"),
                 F.sum(F.when(F.col("nd") > 1, F.col("m"))
                       .otherwise(F.lit(0))).alias("dup_grams"))
            .withColumn("dup_bps", F.expr(
                "CAST(dup_grams * 10000 DIV n_grams AS BIGINT)")))


# Per-document n-gram NOVELTY (round 7; the data-value/contribution
# signal behind "does this doc add anything the corpus hasn't seen"
# pruning — the cross-document complement of dup_ngram_fraction's
# mass view): for each doc, the fraction of its DISTINCT word-3-grams
# whose FIRST corpus occurrence (min doc_id — arrival order) is this
# doc.  A verbatim re-crawl scores 0.0; genuinely fresh text scores
# near 1.0; template-heavy docs land in between, graded by how much
# they add rather than whether they match.
#
# Scale shape: same skeleton as dup_ngram_mass — map-only gram
# explode, per-(doc, gram) distinct, then a gram-keyed MIN aggregate
# (map-side combinable, unlike a window over gram which would funnel
# every doc sharing a stop-gram through one task) joined back to the
# distinct gram table, and a final per-doc rollup.  The (doc, gram)
# table is cached across its two references (the dup_ngram_mass
# lesson: AQE stage reuse does not fire across the agg/probe
# asymmetry).  Exact integer counts + one exact-int double division
# keep the DuckDB oracle bit-identical.
def gram_novelty_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = DUP_NGRAM_N
    grams = (f"transform(sequence(1, size(toks) - {n - 1}), "
             f"i -> array_join(slice(toks, i, {n}), ' '))")
    per = (Tables(spark, sf_dir).documents
           .select("doc_id", F.split("text", " ").alias("toks"))
           .filter(F.size("toks") >= n)
           .select("doc_id", F.explode(F.expr(grams)).alias("gram"))
           .distinct()
           .cache())
    first = per.groupBy("gram").agg(F.min("doc_id").alias("first_doc"))
    return (per.join(first, "gram")
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).cast("long").alias("n_grams"),
                 F.sum(F.when(F.col("first_doc") == F.col("doc_id"),
                              F.lit(1)).otherwise(F.lit(0)))
                 .cast("long").alias("n_novel"))
            .withColumn("novel_frac",
                        F.col("n_novel").cast("double")
                        / F.col("n_grams")))


# Heavy-hitter tokens via the parallel Space-Saving sketch
# (functions/sketch.py): bounded memory per partition no matter the
# vocabulary size — the scale alternative to an exact full-vocabulary
# groupBy when only the top of the Zipf curve matters.  Approximate by
# construction → rows-only driver check; the containment guarantee
# (every token with freq > N/capacity present, counts within max_err)
# is asserted against exact counts in tests.
def text_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from greenplum_dwh_spark.functions.sketch import frequent_items
    t = Tables(spark, sf_dir)
    toks = (t.documents
            .select(F.explode(F.split("text", " ")).alias("token")))
    return frequent_items(toks, "token", capacity=256, top_k=20)


QUERIES = {
    "text_langid": text_langid,
    "text_quality": text_quality,
    "text_tokens": text_tokens,
    "text_fingerprint": text_fingerprint,
    "text_term_stats": text_term_stats,
    "text_bm25_scaled": text_bm25_scaled,
    "text_bm25_topk_ranks": text_bm25_topk_ranks,
    "text_bm25_topk": text_bm25_topk,   # rows-only (float logs)
    "text_repetition": text_repetition,
    "dup_ngram_fraction": dup_ngram_fraction,
    "gram_novelty_scores": gram_novelty_scores,
    "text_heavy_hitters": text_heavy_hitters,  # rows-only (sketch)
}


def _score_sql(lg: str) -> str:
    lst = ", ".join(f"'{w}'" for w in LANG_MARKERS[lg])
    return (f"len(list_intersect(list_distinct(string_split(text, ' ')), "
            f"[{lst}]))::INT")


_LANG_CASE = ("CASE WHEN greatest(s_en, s_de, s_es, s_fr) = 0 THEN 'und' "
              + " ".join(
                  f"WHEN s_{lg} = greatest(s_en, s_de, s_es, s_fr) "
                  f"THEN '{lg}'" for lg in sorted(LANG_MARKERS))
              + " END")

_TERM_STATS_SQL = """
    WITH ex AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                FROM documents),
    tf AS (SELECT doc_id, tok, count(*) AS tf FROM ex GROUP BY 1, 2),
    top AS (SELECT doc_id, tok, tf,
                   row_number() OVER (PARTITION BY doc_id
                       ORDER BY tf DESC, tok) AS rk
            FROM tf),
    dfc AS (SELECT tok, count(DISTINCT doc_id) AS df FROM ex GROUP BY tok)
    SELECT t.doc_id, t.tok AS top_term, t.tf, d.df
    FROM top t JOIN dfc d ON d.tok = t.tok WHERE t.rk = 1"""

ORACLES = {
    "text_langid": f"""
        WITH s AS (SELECT doc_id,
            {', '.join(f'{_score_sql(lg)} AS s_{lg}' for lg in LANG_MARKERS)}
            FROM documents)
        SELECT doc_id, {_LANG_CASE} AS lang_pred,
               s_en, s_de, s_es, s_fr
        FROM s""",
    "text_quality": """
        WITH x AS (SELECT doc_id,
            len(string_split(text, ' ')) AS n_tok,
            len(list_distinct(string_split(text, ' '))) AS n_uniq,
            length(replace(text, ' ', '')) AS nospace
        FROM documents)
        SELECT doc_id, n_tok::INT AS n_tokens, n_uniq::INT AS n_uniq_tokens,
               n_uniq::DOUBLE / n_tok AS ttr,
               nospace::DOUBLE / n_tok AS avg_token_len,
               0.5 * (n_uniq::DOUBLE / n_tok)
                 + 0.5 * least(1.0, n_tok::DOUBLE / 100.0) AS quality_score
        FROM x""",
    "text_tokens": """
        SELECT doc_id,
               len(string_split(text, ' '))::INT AS ws_tokens,
               len(regexp_extract_all(text, '[a-z0-9]+'))::INT AS re_tokens,
               length(text)::INT AS n_chars_measured,
               strlen(text)::INT AS n_bytes
        FROM documents""",
    "text_fingerprint": f"""
        WITH ex AS (SELECT DISTINCT doc_id, md5(sh) AS hh
                    FROM (SELECT doc_id,
                          unnest({H.word_shingles_sql()}) AS sh
                          FROM documents)),
        rk AS (SELECT doc_id, hh,
                      row_number() OVER (PARTITION BY doc_id ORDER BY hh)
                          AS rn
               FROM ex)
        SELECT doc_id, md5(string_agg(hh, '' ORDER BY hh)) AS fingerprint
        FROM rk WHERE rn <= {FINGERPRINT_K} GROUP BY doc_id""",
    "text_term_stats": _TERM_STATS_SQL,
    "text_bm25_scaled": f"""
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
        scored AS (
          SELECT h.tok AS term, h.doc_id, h.tf, h.dl::INT AS dl, f.df,
                 (22::BIGINT * h.tf * s.total_len
                    * (2 * s.n_docs - 2 * f.df + 1)
                    * {_BM25_SCALE})
                 // ((2 * f.df + 1)
                     * (10 * h.tf * s.total_len + 3 * s.total_len
                        + 9 * h.dl * s.n_docs)) AS score_scaled
          FROM hits h JOIN dfc f USING (tok) CROSS JOIN stats s),
        rk AS (SELECT *, row_number() OVER (PARTITION BY term
                   ORDER BY score_scaled DESC, doc_id) AS rank
               FROM scored)
        SELECT term, doc_id, rank::INT AS rank, tf, dl, df,
               score_scaled::BIGINT AS score_scaled
        FROM rk WHERE rank <= {BM25_TOP_K}""",
    "text_bm25_topk_ranks": f"""
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
        agg AS (SELECT doc_id, sum(s_scaled)::BIGINT AS score_scaled
                FROM per_term GROUP BY doc_id),
        rk AS (SELECT *, row_number() OVER (
                   ORDER BY score_scaled DESC, doc_id) AS rank
               FROM agg)
        SELECT doc_id, rank::INT AS rank, score_scaled
        FROM rk WHERE rank <= {BM25_TOP_K}""",
    "text_repetition": """
        WITH g AS (
          SELECT doc_id,
                 (SELECT CASE WHEN len(w) >= 2
                         THEN [w[i] || ' ' || w[i+1]
                               for i in range(1, len(w))]
                         ELSE [text] END
                  FROM (SELECT string_split(text, ' ') w)) AS grams
          FROM documents)
        SELECT doc_id,
               len(grams)::INT AS total_2grams,
               len(list_distinct(grams))::INT AS distinct_2grams,
               1.0 - (len(list_distinct(grams))::DOUBLE / len(grams))
                   AS rep_frac
        FROM g""",
    "dup_ngram_fraction": f"""
        WITH toks AS (
          SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        g AS (
          SELECT doc_id,
                 unnest([array_to_string(w[i:i + {DUP_NGRAM_N - 1}],
                                         ' ')
                         for i in range(1, len(w)
                                        - {DUP_NGRAM_N - 2})])
                     AS gram
          FROM toks WHERE len(w) >= {DUP_NGRAM_N}),
        per AS (
          SELECT doc_id, gram, count(*) AS m FROM g GROUP BY 1, 2),
        nd AS (
          SELECT *, count(*) OVER (PARTITION BY gram) AS nd FROM per)
        SELECT doc_id,
               sum(m)::BIGINT AS n_grams,
               coalesce(sum(m) FILTER (nd > 1), 0)::BIGINT
                   AS dup_grams,
               ((coalesce(sum(m) FILTER (nd > 1), 0) * 10000)
                   // sum(m))::BIGINT AS dup_bps
        FROM nd GROUP BY doc_id""",
    "gram_novelty_scores": f"""
        WITH toks AS (
          SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        g0 AS (
          SELECT doc_id,
                 unnest([array_to_string(w[i:i + {DUP_NGRAM_N - 1}],
                                         ' ')
                         for i in range(1, len(w)
                                        - {DUP_NGRAM_N - 2})])
                     AS gram
          FROM toks WHERE len(w) >= {DUP_NGRAM_N}),
        g AS (SELECT DISTINCT doc_id, gram FROM g0),
        f AS (SELECT gram, min(doc_id) AS first_doc FROM g
              GROUP BY gram)
        SELECT doc_id,
               count(*)::BIGINT AS n_grams,
               sum((first_doc = doc_id)::INT)::BIGINT AS n_novel,
               (sum((first_doc = doc_id)::INT)::DOUBLE / count(*))
                   AS novel_frac
        FROM g JOIN f USING (gram) GROUP BY doc_id""",
}
