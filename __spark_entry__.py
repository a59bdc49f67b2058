"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship multi-join revenue query on sf0.001;
``queries``/``oracle_sql`` expose the full operator inventory of
SURVEY.md §2 plus the training-data-pipeline extensions (dedup,
similarity search, text analysis, sessionization, multimodal columns).

The 7 queries without an ``oracle_sql`` entry are the deliberately
non-SQL-exact ones, each pinned by tests instead:
``text_heavy_hitters`` (Space-Saving sketch; containment + error-bound
guarantees asserted vs exact counts),
``ann_ivf_topk`` (approximate IVF scale path; recall ≥0.95 vs the
exact operator asserted), ``chain_fraud_state`` (general ≥3-chain
state machine — the window variant ``chain_fraud_window`` IS
oracle-checked and the state machine is golden + property-tested
against the reference cursor), ``pack_documents`` (stateful greedy
packing; budget/determinism tests), ``approx_distinct_parts`` /
``approx_percentile_prices`` (sketches; error-bound tests), and
``text_bm25_topk`` (float ln-idf; its integer-scaled twin
``text_bm25_topk_ranks`` IS oracle-checked).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _modules():
    from greenplum_dwh_spark.operators import (curation, dedup,
                                               multimodal_ops,
                                               packing, quality,
                                               reconcile, relational,
                                               retrieval, sessions,
                                               similarity, text_analysis,
                                               timeseries, training_data)
    return [relational, dedup, text_analysis, similarity, sessions,
            multimodal_ops, quality, packing, timeseries, training_data,
            curation, reconcile, retrieval]


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from greenplum_dwh_spark.operators.relational import q5_nation_revenue
    return q5_nation_revenue(spark, "/root/testdata/sf0.001")


#: Run order for the driver's correctness pass.  The driver truncates
#: the tail of this dict when its global budget (~50 slots) runs out,
#: so the ordering IS the verification-freshness lever.  Round-5
#: rotation (round-4 verdict item 1, mechanical): (a) the 21 queries
#: whose latest green row is r02 — two rounds stale, the oldest debt —
#: then (b) the 8 queries whose code paths changed in round 5 (PPJoin
#: two-stage verify → jaccard/char/containment; SimHash recall-probe
#: refactor; fuzzy_doc_pairs segment blocking; merge_upsert order_col;
#: late joiners dq_constraint_violations + table_diff_orders, whose
#: planted keys went collision-proof negative),
#: then (c) 22 of the 45 r03-green queries, dedup/curation families
#: first since they share modules with this round's diffs.  The
#: remaining 23 r03-green and all 50 r04-green rows fall in
#: registration order after these; the 7 no-oracle-by-design queries
#: sit in _RUN_LAST so they never burn a budget slot on a rows-only
#: check while oracle debt exists.
_RUN_FIRST = [
    # (0) new in round 5, never driver-checked — protocol rule (a)
    "dup_ngram_fraction", "bpe_encode_top_words", "dedup_repeated_spans",
    # (a) latest green row is r02 — clear the two-round-stale debt
    "q5_nation_revenue", "range_frame_hour_sum",
    "range_join_hour_buckets", "range_join_tumbling_rewrite",
    "rollup_status_priority", "scalar_subquery_acctbal",
    "semi_join_big_orders", "set_except_customers",
    "set_intersect_customers", "string_funcs_demo", "text_bm25_scaled",
    "text_fingerprint", "text_langid", "text_quality",
    "text_term_stats", "text_tokens", "tumbling_hourly",
    "union_labeled_rules", "window_lag_hop", "window_last_scd1",
    "window_lead_scd2",
    # (b) touched in round 5 — must re-green fresh
    "dedup_jaccard_prefix", "dedup_char_jaccard", "dedup_containment",
    "dedup_simhash", "fuzzy_doc_pairs", "merge_upsert_orders",
    "dq_constraint_violations", "table_diff_orders",
    # (c) r03-green, diff-adjacent families first (share dedup.py /
    # curation funnel modules with this round's changes), then the
    # rows the round-4 verdict named
    "canon_text_dedup", "dedup_embedding_clusters", "dedup_incremental",
    "dedup_keep_best", "dedup_source_overlap",
    "pit_lookup_orders", "gapfill_forward_fill",
    "decontaminate_ngrams", "decontaminate_ngrams8_planted",
    "chunk_documents", "remove_boilerplate_lines", "scrub_pii",
    "mixture_sampling_rates", "bigram_lm_counts", "split_leakage_safe",
    "split_train_holdout", "sample_hash_stratified", "shard_and_order",
    "zorder_keys_orders", "padding_waste_by_order",
    "rank_fusion_rrf", "vocab_topk_coverage",
]
_RUN_LAST = [
    # no-oracle-by-design (rows-only checks; each pinned by tests —
    # see module docstring) run dead last
    "text_heavy_hitters", "ann_ivf_topk", "approx_distinct_parts",
    "approx_percentile_prices", "pack_documents", "chain_fraud_state",
    "text_bm25_topk",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable] = {}
    for mod in _modules():
        out.update(mod.QUERIES)
    from greenplum_dwh_spark.operators.chains_events import (
        chain_fraud_state)
    out["chain_fraud_state"] = chain_fraud_state
    ordered = {k: out[k] for k in _RUN_FIRST if k in out}
    ordered.update((k, v) for k, v in out.items()
                   if k not in _RUN_FIRST and k not in _RUN_LAST)
    ordered.update((k, out[k]) for k in _RUN_LAST if k in out)
    return ordered


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _modules():
        out.update(mod.ORACLES)
    return out
