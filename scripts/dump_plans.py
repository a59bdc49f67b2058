"""Regenerate PLANS.md: the formatted physical plan of one
representative query per plan family, at sf0.01.

The plans are the evidence for the scale claims in SCALE.md — run
this after touching any of the listed operators and re-read the
output: broadcast joins where dims join facts, zero exchanges on the
map-only family, single exchanges on the aggregate family, Generate
(explode) instead of cartesian spines, banded joins instead of cross
joins.

Usage: python scripts/dump_plans.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: query name -> one-line reading of what the plan must show
FAMILIES = {
    "q5_nation_revenue": ("6-way join: every dimension side is a "
                          "BroadcastHashJoin; the fact scans prune to "
                          "the needed columns"),
    "sample_hash_stratified": ("map-only curation verb: no Exchange "
                               "anywhere — scan, project, filter"),
    "argmax_order_per_customer": ("single-shuffle aggregate: partial "
                                  "max_by before the exchange, final "
                                  "after; no window, no join"),
    "gapfill_forward_fill": ("spine via Generate explode (sequence), "
                             "not a calendar cross join; fill is a "
                             "window over the same user partitioning"),
    "outlier_iqr_events": ("group fences re-join the fact side as a "
                           "BroadcastHashJoin — the fact is never "
                           "re-shuffled"),
    "fuzzy_doc_pairs": ("blocked equi-join on (lang, length bucket); "
                        "levenshtein only in the post-join "
                        "filter/project"),
    "dedup_minhash_lsh": ("explode → signature aggregate → banded "
                          "self-join → exact verify; every join is "
                          "hash, not nested-loop"),
    "dedup_repeated_spans": ("suffix-array dedup as ONE scan + two "
                             "hash exchanges: capped-suffix explode "
                             "is map-side, the 5-token-block window "
                             "replaces the global suffix sort, sides "
                             "fan out by explode (a self-union would "
                             "re-run the whole upstream)"),
    "chunk_documents": ("map-only context-window chunking: Generate "
                        "(explode) of per-row chunk spans, zero "
                        "Exchange"),
    "decontaminate_ngrams": ("corpus grams never shuffle: the eval "
                             "gram set broadcasts into a "
                             "BroadcastHashJoin; only the per-doc "
                             "count exchanges"),
    "resample_ohlc": ("two windows + groupBy share ONE (user, hour) "
                      "exchange; open/close picked by row_number, "
                      "no self-join"),
    "table_diff_orders": ("both snapshots reduce to (key, md5 digest) "
                          "in pre-join Projects; the full-outer join "
                          "moves two narrow columns, never row width"),
    "pit_lookup_orders": ("as-of via union-window: ONE Exchange on "
                          "custkey feeds the carry window; the "
                          "fact-side order join is a "
                          "BroadcastHashJoin; no interval join, no "
                          "per-fact candidate blowup"),
    "merge_upsert_orders": ("MERGE rewrite: a single anti join on the "
                            "key (broadcast — the changeset is small) "
                            "+ Union; untouched rows are never "
                            "rewritten row-by-row"),
    "rank_fusion_rrf": ("both source rankings collapse to "
                        "TakeOrderedAndProject pools before the "
                        "fusion join — no global sort of either "
                        "corpus-sized ranking"),
    "key_skew_profile": ("map-side-combined count by key, head via "
                         "TakeOrderedAndProject, 1-row totals "
                         "broadcast — no global sort, no collect"),
    "contrastive_negatives": ("broadcast anchors; WindowGroupLimit "
                              "prunes to top-K per anchor BEFORE the "
                              "exchange on anchor_id"),
    "lm_doc_scores": ("the aggregated LM joins as a "
                      "BroadcastHashJoin (preserving the doc_id "
                      "partitioning through the bigram Generate); "
                      "the corpus side crosses ONE Exchange"),
    "dedup_simhash": ("round-8 short-circuit: on this UNSATURATED "
                      "corpus the alphabet-bounded size check decides "
                      "the r06 single-leg plan — one windowed guard, "
                      "one self-join, NO routing broadcast or "
                      "two-leg union (those appear only when a band "
                      "is over cap, as at the sf10 decade probe)"),
    "nearest_click_event": ("bidirectional as-of from ONE Exchange + "
                            "ONE Sort on user_id: last() over the "
                            "preceding frame and first() over the "
                            "following frame share the window order"),
    "dup_ngram_fraction": ("scan pruned to (doc_id, text); gram "
                           "Generate map-side; every Exchange sits "
                           "behind a partial aggregate — raw gram "
                           "rows never cross the network"),
    "dedup_char_jaccard": ("round-6 dense-slice hybrid: the exact "
                           "prefix self-join AND the banded cohort "
                           "leg each feed their own broadcast "
                           "signature pre-filter (no Union before "
                           "the filter — codegen fusion preserved); "
                           "dense_g is a BroadcastExchange; only "
                           "survivor pairs union"),
    "knn_doc_graph": ("thresholded kNN: PPJoin pair list "
                      "symmetrized by Union of two Projects (no "
                      "second join); WindowGroupLimit keeps K rows "
                      "per doc BEFORE the window Exchange"),
    "lang_quota_sample": ("distributed prefix sum: subtotal "
                          "HashAggregate + broadcast offsets join + "
                          "per-(lang,bucket) windows — no "
                          "whole-language single-partition window "
                          "anywhere in the plan"),
    "dedup_embedding_lsh": ("round-8 SRP rewrite: signatures are ONE "
                            "map-side Project over the nested plane "
                            "literal (no n×planes crossJoin, no "
                            "collect_list shuffle); banded self-join "
                            "through the shared hot-band guard; exact "
                            "cosine verify only on collisions"),
    "asof_join_multikey": ("multi-key as-of with tolerance: union-tag "
                           "then ONE Exchange + Sort on (user, chan) "
                           "drives the carry-forward window — no "
                           "range join, no per-trade candidate "
                           "blowup; the quote dedup window shares the "
                           "same sort prefix"),
    "curation_funnel_counts": ("composed funnel: every stage boundary "
                               "is a checkpointed ID scan (lineage "
                               "truncated — stage k's count is scan + "
                               "k id joins, not a re-run of stages "
                               "1..k), so the ten unioned aggregates "
                               "share the materialized stage work"),
    "dedup_paragraphs": ("first-wins paragraph dedup: winner is a "
                         "partial_min(struct) aggregate re-joined on "
                         "the line key — NO Window over line (a "
                         "stop-paragraph would funnel its docs "
                         "through one task); reassembly is one "
                         "doc-keyed ObjectHashAggregate with "
                         "partials"),
    "dedup_paragraphs_hashed": ("the 100 TB form: winner agg, flag "
                                "join and drop aggregate all key on "
                                "(xxhash64, length) — the paragraph "
                                "text column appears in NO exchange "
                                "before the final doc_id join; "
                                "reassembly is a map-side filter "
                                "over split(text), no line-level "
                                "groupBy at all"),
    "cumulative_users_rollup_merge": ("streaming-rollup algebra: three "
                                      "slice scans reduce to per-user "
                                      "partial MIN aggregates (partial "
                                      "before each exchange), one merge "
                                      "aggregate, then day-level "
                                      "work on |days| rows — no "
                                      "corpus-sized window"),
    "mixture_apply_sample": ("mixture application: the rates subplan "
                             "aggregates to |sources| rows and joins "
                             "back as a BroadcastHashJoin — the "
                             "corpus scan is never re-shuffled; "
                             "keep/drop is a map-side md5 predicate"),
    "dedup_image_phash": ("image near-dup: ONE MapInPandas pass "
                          "(BMP pack + dHash) feeds an InMemory "
                          "hash table; every later stage — band "
                          "explode, windowed hot-bucket guard, "
                          "candidate equi-join, xor/popcount "
                          "verify — is JVM-side over two int64 "
                          "halves; no cartesian, no nested loop, "
                          "pixels never shuffle"),
}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import __spark_entry__ as e
    from greenplum_dwh_spark.session import get_spark
    spark = get_spark("dump_plans", extra_conf={"spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    qs = e.queries()

    out = ["# PLANS — formatted physical plans, one per plan family",
           "",
           f"Generated by `scripts/dump_plans.py` at `{sf_dir}` "
           "(regenerate after touching these operators).  Each section "
           "states what the plan must show; the plan below it is the "
           "proof.", ""]
    for name, reading in FAMILIES.items():
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        out += [f"## {name}", "", f"**Must show:** {reading}", "",
                "```", plan.rstrip(), "```", ""]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print("wrote PLANS.md")


if __name__ == "__main__":
    main()
