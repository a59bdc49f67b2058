"""Semantic invariants + plan shapes for the curation operator family
(decontamination, splits, chunking, boilerplate removal, LM counts,
sharding) and the OHLC resample.  Oracle parity is covered separately
by test_oracle_parity.py's auto-parametrization; these tests pin the
properties the oracle comparison alone can't express (determinism
under repartitioning, coverage/overlap guarantees, plan shapes)."""

from __future__ import annotations

from pyspark.sql import functions as F

from greenplum_dwh_spark.operators import curation, timeseries
from greenplum_dwh_spark.plans import checks


def test_decontaminate_excludes_eval_docs_and_bounds(spark, sf_dir):
    df = curation.decontaminate_ngrams(spark, sf_dir)
    out = df.collect()
    assert len(out) > 0  # the calibrated n actually fires on this corpus
    for r in out:
        assert r.doc_id % 97 != 0  # eval slice never flags itself
        assert 1 <= r.n_hit_grams <= r.n_hits
    # plan shape: the eval side joins as a broadcast, never a cartesian
    plan = checks.physical_plan(df)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_split_partitions_whole_corpus(spark, sf_dir):
    out = curation.split_train_holdout(spark, sf_dir)
    total = out.agg(F.sum("n_docs")).collect()[0][0]
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert total == n_docs
    splits = {r.split for r in out.collect()}
    assert splits <= {"train", "val", "test"}
    train = (out.filter(F.col("split") == "train")
             .agg(F.sum("n_docs")).collect()[0][0] or 0)
    assert train / n_docs > 0.9  # 98% nominal, small-sample slack


def test_chunks_cover_every_token_with_overlap(spark, sf_dir):
    w, s = curation.CHUNK_WINDOW, curation.CHUNK_STRIDE
    rows = curation.chunk_documents(spark, sf_dir).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    docs = {r.doc_id: r.n_tok for r in spark.read.parquet(
        f"{sf_dir}/documents.parquet")
        .select("doc_id", F.size(F.split("text", " ")).alias("n_tok"))
        .collect()}
    for doc_id, chunks in by_doc.items():
        chunks.sort(key=lambda r: r.chunk_id)
        assert chunks[0].tok_start == 1
        assert chunks[-1].tok_end == docs[doc_id]
        for a, b in zip(chunks, chunks[1:]):
            assert b.tok_start == a.tok_start + s  # fixed stride
            assert b.tok_start <= a.tok_end + 1  # no token gap
        for c in chunks:
            assert c.tok_end - c.tok_start + 1 <= w
    # map-only: no shuffle at any corpus size
    assert checks.exchange_count(
        curation.chunk_documents(spark, sf_dir)) == 0


def test_boilerplate_lines_removed_unique_lines_kept(spark, sf_dir):
    df = curation.remove_boilerplate_lines(spark, sf_dir)
    for r in df.collect():
        assert "subscribe to our newsletter today" not in r.clean_text
        assert "all rights reserved worldwide" not in r.clean_text
        assert f"ref code {r.doc_id}" in r.clean_text  # unique line kept
        assert r.n_lines_kept == len(r.clean_text.split("\n"))
    plan = checks.physical_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_bigram_totals_are_consistent(spark, sf_dir):
    out = curation.bigram_lm_counts(spark, sf_dir)
    # n_w1 must equal the sum of n_pair within each w1 — the exact
    # denominator of p(w2|w1)
    bad = (out.groupBy("w1", "n_w1")
           .agg(F.sum("n_pair").alias("s"))
           .filter(F.col("s") != F.col("n_w1")))
    assert bad.count() == 0
    # conditional probabilities per w1 sum to exactly 1 as rationals
    probs = (out.groupBy("w1")
             .agg(F.sum(F.col("n_pair") / F.col("n_w1")).alias("p")))
    for r in probs.collect():
        assert abs(r.p - 1.0) < 1e-9


def test_shard_positions_are_dense_and_deterministic(spark, sf_dir):
    a = curation.shard_and_order(spark, sf_dir)
    # dense 1..n positions inside every shard
    per = (a.groupBy("shard")
           .agg(F.count(F.lit(1)).alias("n"), F.max("pos").alias("mx"),
                F.min("pos").alias("mn"),
                F.countDistinct("pos").alias("nd")))
    for r in per.collect():
        assert (r.mn, r.mx, r.nd) == (1, r.n, r.n)
    # byte-identical under a different INPUT partitioning: repartition
    # the documents BEFORE the shard/order derivation — a
    # partitioning-dependent ordering (e.g. rand() or monotonically_
    # increasing_id) would produce different (shard, pos) pairs here
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    b = curation.shard_order(docs.repartition(13))
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_ohlc_bar_invariants(spark, sf_dir):
    out = timeseries.resample_ohlc(spark, sf_dir)
    bad = out.filter(
        (F.col("open_cents") < F.col("low_cents"))
        | (F.col("open_cents") > F.col("high_cents"))
        | (F.col("close_cents") < F.col("low_cents"))
        | (F.col("close_cents") > F.col("high_cents"))
        | (F.col("n_events") < 1))
    assert bad.count() == 0
    total = out.agg(F.sum("n_events")).collect()[0][0]
    n_events = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert total == n_events
    # two windows + the groupBy all share one (user_id, hour) hash
    # partitioning: exactly one shuffle exchange in the whole plan
    assert checks.exchange_count(out) == 1


def test_keep_best_keeper_dominates_cluster(spark, sf_dir):
    from greenplum_dwh_spark.operators.dedup import (dedup_clusters,
                                                     dedup_keep_best)
    kept = dedup_keep_best(spark, sf_dir)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # survivors partition the corpus: Σ n_members == n_docs
    assert kept.agg(F.sum("n_members")).collect()[0][0] == docs.count()
    # keeper length is the max within its cluster
    cl = dedup_clusters(spark, sf_dir)
    members = (docs.select("doc_id", "n_chars")
               .join(cl, "doc_id", "left")
               .select("n_chars",
                       F.coalesce("cluster_id", "doc_id")
                       .alias("cluster_id")))
    mx = members.groupBy("cluster_id").agg(F.max("n_chars").alias("mx"))
    bad = kept.join(mx, "cluster_id").filter(F.col("n_chars") != F.col("mx"))
    assert bad.count() == 0


def test_quantize_bounds_and_scale(spark, sf_dir):
    from greenplum_dwh_spark.operators.similarity import embedding_quantize
    out = embedding_quantize(spark, sf_dir)
    bad = out.filter((F.col("q_max") > 127) | (F.col("q_min") < -127)
                     | (F.col("scale") <= 0))
    assert bad.count() == 0
    # map-only: no shuffle at any corpus size
    assert checks.exchange_count(out) == 0


def test_table_diff_classifies_exactly_the_planted_changes(spark, sf_dir):
    from greenplum_dwh_spark.operators.reconcile import (plant_key,
                                                         table_diff_orders)
    out = table_diff_orders(spark, sf_dir).collect()
    by = {}
    for r in out:
        by.setdefault(r.change, set()).add(r.o_orderkey)
    keys = [r.o_orderkey for r in spark.read.parquet(
        f"{sf_dir}/orders.parquet").select("o_orderkey").collect()]
    assert by.get("removed", set()) == {k for k in keys if k % 101 == 0}
    assert by.get("added", set()) == {plant_key(k) for k in keys
                                      if k % 17 == 0}
    # repriced rows that were NOT simultaneously removed
    assert by.get("changed", set()) == {k for k in keys
                                        if k % 13 == 0 and k % 101 != 0}
    # plan shape: narrow full-outer equi-join on (key, digest)
    plan = checks.physical_plan(table_diff_orders(spark, sf_dir))
    assert "FullOuter" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the digest must be computed in a pre-join Project (the md5 shows
    # up below the join), so the shuffle moves (key, digest) only —
    # the join output schema itself carries just the two digests
    assert "md5" in plan
    join_line = next(line for line in plan.splitlines()
                     if "FullOuter" in line)
    assert "o_orderpriority" not in join_line
    assert "cents" not in join_line


def test_cumulative_distinct_users_invariants(spark, sf_dir):
    from greenplum_dwh_spark.operators.timeseries import (
        cumulative_distinct_users)
    rows = sorted(cumulative_distinct_users(spark, sf_dir).collect(),
                  key=lambda r: r.day)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    assert rows[-1].cum_users == ev.select("user_id").distinct().count()
    assert rows[0].cum_users == rows[0].new_users
    for a, b in zip(rows, rows[1:]):
        assert b.cum_users == a.cum_users + b.new_users  # exact recurrence


def test_curate_pipeline_funnel(spark, sf_dir):
    """The composed end-to-end curation pipeline (exact dedup →
    keep-best → decontaminate → split → chunk → shard) must form a
    monotone funnel with every stage nonempty."""
    import importlib
    mod = importlib.import_module("scripts.curate_pipeline")
    s = mod.run(spark, sf_dir)
    assert (s["raw_docs"] >= s["after_exact_dedup"]
            >= s["after_neardup_keep_best"]
            >= s["after_repeated_span_dedup"]
            > s["after_decontamination"]
            >= s["after_dup_gram_filter"]
            >= s["after_lm_quality_filter"]
            >= s["train_docs"] > 0)
    assert s["chunks"] >= s["train_docs"]  # ≥1 chunk per doc
    assert 0 < s["shards"] <= 32
    assert 0 <= s["padding_waste_sorted"] <= s["padding_waste_arrival"]


def test_decontaminate_n8_flags_planted_docs(spark, sf_dir):
    """At the realistic n=8: every planted doc (doc_id % 41 == 1,
    non-eval) is flagged, no eval doc is flagged, and any OTHER
    flagged doc is one of the corpus's planted near-duplicate copies
    of an eval doc — i.e. genuinely contaminated (they share ≥8-gram
    runs with the eval slice by construction of the testdata)."""
    out = curation.decontaminate_ngrams8_planted(spark, sf_dir)
    flagged = {r.doc_id for r in out.collect()}
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    planted = {d for d in range(n_docs)
               if d % curation.PLANT_MOD == 1 and d % 97 != 0}
    assert planted <= flagged  # no planted doc escapes
    assert all(d % 97 != 0 for d in flagged)  # eval never flags itself


def test_lm_doc_scores_invariants(spark, sf_dir):
    """Every doc scores n_bigrams = tokens − 1; each addend is a
    scaled conditional probability ≤ SCALE, so sum ≤ SCALE·n_bigrams
    and avg ≤ SCALE; a document made of the corpus's most predictable
    bigrams must out-score one made of unique bigrams."""
    from greenplum_dwh_spark.operators.curation import (LM_SCALE,
                                                        lm_doc_scores)
    from greenplum_dwh_spark.sources.tpch import Tables
    out = lm_doc_scores(spark, sf_dir)
    toks = Tables(spark, sf_dir).documents.select(
        "doc_id", F.size(F.split("text", " ")).alias("n_tok"))
    j = out.join(toks, "doc_id")
    assert j.filter(F.col("n_bigrams") != F.col("n_tok") - 1).count() == 0
    bad = out.filter(
        (F.col("lm_score_sum") > LM_SCALE * F.col("n_bigrams"))
        | (F.col("lm_score_avg") > LM_SCALE)
        | (F.col("lm_score_sum") < 0))
    assert bad.count() == 0
    # scores discriminate: the corpus has a spread, not a constant
    stats = out.agg(F.min("lm_score_avg").alias("lo"),
                    F.max("lm_score_avg").alias("hi")).first()
    assert stats["lo"] < stats["hi"]
    # plan shape: the LM table joins as a broadcast (the only join
    # preserving the doc_id partitioning), so the corpus-sized side
    # moves through exactly ONE exchange — the explicit doc_id
    # repartition; every other exchange carries the vocab-sized LM
    plan = checks.physical_plan(out)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert not checks.has_python_udf(out)


def test_bpe_pair_counts_totals(spark, sf_dir):
    """Positional pair counting: Σ_pairs n_occ = Σ_words
    (len(w)−1)·n_w over the ≥2-char vocabulary, and support never
    exceeds occurrences."""
    from greenplum_dwh_spark.operators.curation import bpe_pair_counts
    from greenplum_dwh_spark.sources.tpch import Tables
    out = bpe_pair_counts(spark, sf_dir)
    got = out.agg(F.sum("n_occ")).first()[0]
    want = (Tables(spark, sf_dir).documents
            .select(F.explode(F.split("text", " ")).alias("w"))
            .filter(F.length("w") >= 2)
            .agg(F.sum(F.length("w") - 1)).first()[0])
    assert got == want
    assert out.filter(F.col("n_words") > F.col("n_occ")).count() == 0
    assert out.filter(F.length("pair") != 2).count() == 0
    # plan shape: the corpus reduces map-side to the word-count table
    # (partial aggregation before the first exchange); the pair
    # explode runs over the aggregated vocab only — two exchanges
    # total, no joins
    assert checks.exchange_count(out) == 2
    plan = checks.physical_plan(out)
    assert "Join" not in plan
    assert not checks.has_python_udf(out)


def test_bpe_encode_learns_and_applies_merges(spark, tmp_path):
    """Hand-traced BPE on a planted vocabulary: {abab×10, ab×5, cd×3}.
    Round 1 must pick ('a','b') (weight 25) and merge BOTH abutting
    occurrences inside 'a b a b' in one pass (the two-space separator
    contract — a single-space encoding would leave 'ab a b'); round 2
    then merges ('ab','ab'); round 3 ('c','d'); the remaining rounds
    find no pairs and no-op.  Final segmentations are all single
    tokens, which is reachable ONLY via the correct greedy trace."""
    from greenplum_dwh_spark.operators.curation import (
        bpe_encode_top_words)
    text = " ".join(["abab"] * 10 + ["ab"] * 5 + ["cd"] * 3)
    spark.createDataFrame(
        [(0, text, "en", "src", len(text))],
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    ).write.parquet(str(tmp_path / "documents.parquet"))
    got = {r["word"]: (r["n_w"], r["tokens"], r["n_tokens"])
           for r in bpe_encode_top_words(
               spark, str(tmp_path)).collect()}
    assert got == {"abab": (10, "abab", 1),
                   "ab": (5, "ab", 1),
                   "cd": (3, "cd", 1)}


def test_quota_sample_prefix_sum_equals_serial_window(spark):
    """The distributed prefix sum (bucket subtotals + offsets + local
    cumsum) must equal the serial single-window cumulative sum on a
    skewed fixture — one group holds 80% of the rows (the shape that
    makes the naive per-group window a straggler at scale), another
    group fits entirely under budget, and a third has exactly one
    doc.  Run with a tiny bucket count so multiple buckets per group
    actually carry offsets."""
    import random

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from greenplum_dwh_spark.functions import hashing as H
    from greenplum_dwh_spark.operators.curation import quota_sample

    rng = random.Random(5)
    rows = []
    did = 0
    for lang, n in (("en", 80), ("de", 5), ("xx", 1)):
        for _ in range(n):
            rows.append((did, " ".join("w%d" % rng.randrange(50)
                                       for _ in range(rng.randrange(5, 40))),
                         lang))
            did += 1
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")

    got = {tuple(r) for r in quota_sample(
        docs, budget=300, n_buckets=4).collect()}

    toks = F.size(F.split(F.col("text"), " ")).cast("long")
    h = H.hash60(F.col("doc_id").cast("string"))
    w = (Window.partitionBy("lang").orderBy("h", "doc_id")
         .rowsBetween(Window.unboundedPreceding, 0))
    want = {tuple(r) for r in
            docs.select("lang", "doc_id", toks.alias("toks"),
                        h.alias("h"))
            .withColumn("cum_toks", F.sum("toks").over(w))
            .filter(F.col("cum_toks") <= 300)
            .select("lang", "doc_id", "toks", "cum_toks").collect()}
    assert got == want
    # the under-budget group survives whole; the singleton survives
    langs = {r[0] for r in got}
    assert {"de", "xx"} <= langs
    assert sum(1 for r in got if r[0] == "de") == 5
    # budget actually binds on the heavy group
    assert sum(1 for r in got if r[0] == "en") < 80
    # keep rule: cumulative INCLUSIVE <= budget, so no overshoot
    assert all(r[3] <= 300 for r in got)


def test_quality_percentile_decomposed_rank_equals_serial_window(spark,
                                                                 tmp_path):
    """The decomposed rank (per-(lang, score) offsets + cell-local
    row_number — no per-language corpus window anywhere) must equal
    the serial single-window percent_rank form on a skewed fixture,
    and the exact-integer keep predicate must match the rational
    percentile bound at the tie-heavy boundary."""
    import random

    from pyspark.sql import Window
    from greenplum_dwh_spark.operators.curation import (
        QUALITY_PCT_DEN, QUALITY_PCT_NUM, quality_percentile_filter)

    rng = random.Random(9)
    rows = []
    did = 0
    for lang, n in (("en", 120), ("de", 7), ("xx", 1)):
        for _ in range(n):
            # few distinct token counts → heavy rank ties at the cut
            rows.append((did, " ".join("w" for _ in
                                       range(rng.choice((5, 5, 8, 13)))),
                         lang, "s", 1))
            did += 1
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
              " n_chars long") \
        .write.parquet(str(tmp_path / "documents.parquet"))

    got = {tuple(r) for r in
           quality_percentile_filter(spark, str(tmp_path)).collect()}

    from greenplum_dwh_spark.functions import hashing as H
    docs = spark.read.parquet(str(tmp_path / "documents.parquet"))
    w = Window.partitionBy("lang").orderBy("toks", "h", "doc_id")
    want = {tuple(r) for r in
            docs.select("lang", "doc_id",
                        F.size(F.split("text", " ")).cast("long")
                        .alias("toks"),
                        H.hash60(F.col("doc_id").cast("string"))
                        .alias("h"))
            .withColumn("rk", F.row_number().over(w).cast("long"))
            .withColumn("n_lang", F.count(F.lit(1)).over(
                Window.partitionBy("lang")).cast("long"))
            .filter(QUALITY_PCT_DEN * (F.col("rk") - 1)
                    >= QUALITY_PCT_NUM * (F.col("n_lang") - 1))
            .select("lang", "doc_id", "toks", "rk", "n_lang").collect()}
    assert got == want
    # singleton group: (n−1)=0 keeps its only doc
    assert sum(1 for r in got if r[0] == "xx") == 1
    # the cut actually bites on the heavy group (~30% kept)
    n_en = sum(1 for r in got if r[0] == "en")
    assert 0 < n_en < 120 and abs(n_en - 36) <= 2


def test_gram_novelty_scores_semantics(spark, tmp_path):
    """First doc of a template scores 1.0, a verbatim later copy 0.0,
    and a half-borrowed doc lands exactly at its distinct-gram share;
    the plan derives first-occurrence via a gram AGGREGATE (no window
    over gram: a stop-gram would funnel its docs through one task)."""
    from greenplum_dwh_spark.operators.text_analysis import (
        gram_novelty_scores)
    a = "the quick brown fox jumps over the lazy dog"
    b = a                                    # verbatim re-crawl
    c = "the quick brown fox says something entirely new today"
    rows = [(0, a, "en", "s", len(a)), (1, b, "en", "s", len(b)),
            (2, c, "en", "s", len(c))]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
              " n_chars long") \
        .write.parquet(str(tmp_path / "documents.parquet"))
    out = {r["doc_id"]: r for r in
           gram_novelty_scores(spark, str(tmp_path)).collect()}
    assert out[0]["novel_frac"] == 1.0
    assert out[1]["novel_frac"] == 0.0
    # doc 2 shares exactly its first two 3-grams with doc 0
    assert out[2]["n_novel"] == out[2]["n_grams"] - 2
    assert out[2]["novel_frac"] == (out[2]["n_novel"]
                                    / out[2]["n_grams"])
    plan = checks.physical_plan(gram_novelty_scores(spark, str(tmp_path)))
    assert "CartesianProduct" not in plan
    # first_doc comes from partial_min aggregation, not a gram window
    assert "partial_min" in plan.lower() or "min(doc_id" in plan


def test_quota_sample_rejects_non_power_of_two_buckets(spark):
    import pytest

    from greenplum_dwh_spark.operators.curation import quota_sample
    docs = spark.createDataFrame([(1, "a b", "en")],
                                 "doc_id long, text string, lang string")
    with pytest.raises(AssertionError):
        quota_sample(docs, n_buckets=24).collect()


def test_curation_funnel_counts_policy_pinned(spark, tmp_path):
    """Round-8 funnel query: every stage's drop policy pinned on a
    corpus designed so each stage fires on exactly one known doc —
    doc 2 (exact dup of 1), doc 3 (near-dup of the longer 4), doc 0
    (the eval slice itself) + doc 5 (shares an eval 3-gram), doc 8
    (dup_bps 10000, the deterministic top-2% victim — no hash
    tiebreak at the boundary), nobody at the LM stage (5% of 4 scored
    docs < 1), and the 1-token doc 7 surviving both rank cuts
    unscored."""
    import hashlib

    from greenplum_dwh_spark.operators.curation import (
        curation_funnel_counts)
    texts = {0: "e1 e2 e3 e4",                 # eval doc (0 % 97)
             1: "a b c d e f g h",
             2: "a b c d e f g h",             # exact dup -> stage 1
             3: "p q r s t u v w",             # near-dup, shorter
             4: "p q r s t u v w x y",         # near-dup, kept
             5: "k1 k2 e1 e2 e3 k3 k4 k5",     # eval 3-gram -> decon
             6: "m1 m2 m3 m4 m5 m6 m7 m8",
             7: "solo",                        # unscored, must survive
             8: "w1 w2 w3 w4",                 # dup_bps 10000 -> cut
             9: "w1 w2 w3 w4 n1 n2 n3 n4"}     # dup_bps 3333, kept
    rows = [(i, t, "en", "s", len(t)) for i, t in texts.items()]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
              " n_chars long") \
        .write.parquet(str(tmp_path / "documents.parquet"))
    got = {r["stage"]: r["n_rows"] for r in
           curation_funnel_counts(spark, str(tmp_path)).collect()}

    def bucket(i, mod):
        return int(hashlib.md5(str(i).encode()).hexdigest()[:6],
                   16) % mod

    d6 = [1, 4, 6, 7, 9]
    train = [i for i in d6 if bucket(i, 10000) < 9800]
    assert got == {"00_raw": 10, "01_exact_dedup": 9,
                   "02_neardup_keep_best": 8,
                   "03_repeated_span_dedup": 8,
                   "04_decontaminated": 6, "05_dup_gram_filter": 5,
                   "06_lm_quality_filter": 5,
                   "07_train_split": len(train),
                   # every doc is <= 64 tokens -> one chunk each
                   "08_chunks": len(train),
                   "09_shards": len({bucket(i, 32) for i in train})}


def test_dedup_paragraphs_first_wins_semantics(spark, tmp_path):
    """Pin the first-occurrence contract on a hand-built corpus:
    (a) a paragraph shared by many docs survives ONLY in its min
    (doc_id, pos) occurrence; (b) sub-floor lines ("ok") are exempt
    everywhere; (c) an intra-doc repeat keeps the earlier pos;
    (d) unlike remove_boilerplate_lines, the first copy is PRESERVED
    (no information loss); (e) reassembly preserves original line
    order.  The planted fixture routes through the same plant the
    driver query uses, so doc text itself carries the duplicates."""
    shared = "every doc repeats this exact paragraph"
    texts = {
        # doc 1: shared para at pos 1 AND pos 3 (intra-doc repeat) —
        # only the pos-1 copy survives anywhere in the corpus
        1: shared + "\nmiddle filler line one\n" + shared,
        2: shared + "\nsecond doc own content here",
        3: "third doc own content lines\n" + shared,
    }
    rows = [(i, t, "en", "s", len(t)) for i, t in texts.items()]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
              " n_chars long") \
        .write.parquet(str(tmp_path / "documents.parquet"))
    got = {r["doc_id"]: r for r in
           curation.dedup_paragraphs(spark, str(tmp_path)).collect()}

    lines1 = got[1]["clean_text"].split("\n")
    assert lines1[0] == shared                      # (a)+(d): first kept
    assert lines1[1] == "middle filler line one"    # (e): order intact
    assert "ok" in lines1                           # (b): exempt line
    assert lines1.count(shared) == 1                # (c): repeat dropped
    assert got[1]["n_dropped"] == 1
    for d in (2, 3):
        assert shared not in got[d]["clean_text"].split("\n")
        assert "ok" in got[d]["clean_text"].split("\n")
    # every doc keeps its unique planted para; promo block 1/2/3 all
    # differ (doc_id % 5), so the only cross-doc drops are `shared`
    assert got[2]["n_dropped"] == 1 and got[3]["n_dropped"] == 1
    # totals: kept + dropped = exploded line count per doc
    assert got[1]["n_kept"] + got[1]["n_dropped"] == 6


def _collect_para(df):
    return sorted((r["doc_id"], r["clean_text"], r["n_kept"],
                   r["n_dropped"]) for r in df.collect())


def test_paragraph_dedup_hashed_byte_identical(spark):
    """Round 9: the hashed-line plan (text never rides the winner
    aggregate / flag join / a reassembly groupBy) must be
    BYTE-IDENTICAL to the verbatim plan — on first-wins, intra-doc
    repeats, the sub-floor exemption, the banned face, and the
    empty-doc contract (a fully-banned doc yields clean_text = ''
    on both paths)."""
    shared = "every doc repeats this exact paragraph"
    other = "a different shared paragraph block"
    docs = spark.createDataFrame(
        [(1, shared + "\nmiddle filler line one\n" + shared),
         (2, shared + "\nok\nsecond doc own content here"),
         (3, other + "\n" + shared + "\nthird doc own content"),
         # doc 4: EVERY line banned/duplicate -> fully emptied
         (4, shared + "\n" + other)],
        "doc_id long, text string")
    banned = spark.createDataFrame(
        [(shared,), (other,), ("claimed by an earlier batch",)],
        "line string")
    for b in (None, banned):
        got_v = _collect_para(curation.paragraph_dedup_core(
            docs, banned=b))
        got_h = _collect_para(curation.paragraph_dedup_core(
            docs, banned=b, hashed=True))
        assert got_v == got_h
    # the banned run empties doc 4 entirely: '' (never NULL), 0 kept
    emptied = [r for r in got_h if r[0] == 4]
    assert emptied == [(4, "", 0, 2)]


def test_paragraph_dedup_hashed_randomized_parity(spark):
    """Property-style pin: 60 docs assembled from a 14-paragraph pool
    (plus sub-floor fragments and intra-doc repeats, deterministic
    arrangement) — the hashed and verbatim plans agree byte-for-byte
    on every doc."""
    import hashlib
    pool = [f"pool paragraph number {i} with shared body text"
            for i in range(14)] + ["ok", "hm", "tiny"]
    rows = []
    for d in range(60):
        h = hashlib.md5(str(d).encode()).hexdigest()
        lines = [pool[int(h[j], 16) % len(pool)] for j in range(6)]
        lines.append(f"unique closer for document {d}")
        rows.append((d, "\n".join(lines)))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    assert (_collect_para(curation.paragraph_dedup_core(docs))
            == _collect_para(curation.paragraph_dedup_core(
                docs, hashed=True)))


def test_cumulative_users_rollup_merge_equals_serial(spark, sf_dir,
                                                     tmp_path):
    """Round 9: the streaming-rollup decomposition (per-slice partial
    first-seen indexes merged on read) must equal the serial
    single-scan form — on the corpus AND on a hand fixture where a
    user's global first day lives in a DIFFERENT slice than most of
    their events (the case a per-day partial count, unlike a per-user
    MIN, would get wrong)."""
    from datetime import datetime as dt

    from greenplum_dwh_spark.operators.timeseries import (
        cumulative_distinct_users, cumulative_users_rollup_merge)

    serial = sorted(map(tuple,
                        cumulative_distinct_users(spark, sf_dir)
                        .collect()))
    merged = sorted(map(tuple,
                        cumulative_users_rollup_merge(spark, sf_dir)
                        .collect()))
    assert serial == merged

    # user 1: first event (day 1) has event_id 2 -> slice 2; their
    # other events sit in slices 0/1 on later days.  user 2 appears
    # only on day 1.  A per-slice per-day count would report user 1
    # as "new" twice; the per-user MIN partial must not.
    rows = [(2, dt(2024, 3, 1), 1), (3, dt(2024, 3, 2), 1),
            (4, dt(2024, 3, 3), 1), (6, dt(2024, 3, 1), 2),
            (7, dt(2024, 3, 3), 3)]
    spark.createDataFrame(
        [(e, t, u, "click", 1.0, "{}") for e, t, u in rows],
        "event_id long, ts timestamp, user_id long,"
        " event_type string, value double, props string") \
        .write.parquet(str(tmp_path / "events.parquet"))
    got = sorted(map(tuple, cumulative_users_rollup_merge(
        spark, str(tmp_path)).collect()))
    assert got == [("2024-03-01", 2, 2), ("2024-03-02", 0, 2),
                   ("2024-03-03", 1, 3)]


def test_mixture_apply_sample_consistency(spark, sf_dir):
    """Round 9: the mixture-application query's outputs must be
    internally consistent with the rates table it chains — same
    rate_ppm per source, sampled ⊆ input, a full-rate source
    (rate_ppm = 1e6) keeps everything, and every sampled doc count
    matches an independent recount under the shared md5 recipe."""
    from greenplum_dwh_spark.functions.hashing import md5_bucket
    from greenplum_dwh_spark.operators.training_data import (
        mixture_apply_sample, mixture_sampling_rates)

    rates = {r["source"]: r["rate_ppm"] for r in
             mixture_sampling_rates(spark, sf_dir).collect()}
    got = {r["source"]: r for r in
           mixture_apply_sample(spark, sf_dir).collect()}
    assert set(got) == set(rates)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    for src, r in got.items():
        assert r["rate_ppm"] == rates[src]
        # independent recount under the shared md5 recipe
        assert r["n_docs_sampled"] == docs.filter(
            (F.col("source") == src)
            & (md5_bucket(F.col("doc_id"), 1_000_000)
               < rates[src])).count()
        assert 0 <= r["n_docs_sampled"] <= r["n_docs_in"]
        assert 0 <= r["n_tokens_sampled"] <= r["n_tokens_in"]
        if r["rate_ppm"] == 1_000_000:
            assert r["n_docs_sampled"] == r["n_docs_in"]
            assert r["n_tokens_sampled"] == r["n_tokens_in"]
    # at least one source must actually be downsampled for the query
    # to be exercising the rate (the corpus mixes source masses)
    assert any(r["n_docs_sampled"] < r["n_docs_in"]
               for r in got.values())


def test_paragraph_dedup_banned_keys_parity(spark):
    """Round 9: a PRE-HASHED banned set (the streaming index's
    (lh, ln) columns) must produce byte-identical output to the
    verbatim-line banned input under the hashed path, and
    banned_keys without hashed=True must be refused."""
    import pytest

    docs = spark.createDataFrame(
        [(1, "shared paragraph body text\nunique one"),
         (2, "shared paragraph body text\nok\nunique two")],
        "doc_id long, text string")
    banned = spark.createDataFrame(
        [("shared paragraph body text",)], "line string")
    keys = banned.select(*curation._line_key(F.col("line")))
    via_lines = _collect_para(curation.paragraph_dedup_core(
        docs, banned=banned, hashed=True))
    via_keys = _collect_para(curation.paragraph_dedup_core(
        docs, banned_keys=keys, hashed=True))
    assert via_lines == via_keys
    # the shared para is banned from BOTH docs (no local winner)
    assert all("shared" not in r[1] for r in via_keys)
    with pytest.raises(ValueError, match="hashed"):
        curation.paragraph_dedup_core(docs, banned_keys=keys)
