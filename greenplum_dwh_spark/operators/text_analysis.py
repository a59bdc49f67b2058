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


QUERIES = {
    "text_langid": text_langid,
    "text_quality": text_quality,
    "text_tokens": text_tokens,
    "text_fingerprint": text_fingerprint,
    "text_term_stats": text_term_stats,
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
}
