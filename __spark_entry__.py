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
#: so the ordering IS the verification-freshness lever.  Round-7
#: rotation (round-6 verdict item 1, mechanical): (0) the one NEW
#: round-7 query (multimodal_av — the fused frames+audio kernel from
#: the ledger consolidation, never driver-checked), then (a) the
#: r04-latest-green queries — two rounds stale, all 27 named by the
#: round-6 verdict, minus the four retired in the consolidation
#: (multimodal_meta/resize/frames/audio folded into the survivors) —
#: then (b) the queries whose code paths changed in round 7 (the
#: fuzzy verify's (lang, blk) re-check + blocking-key insurance; the
#: PPJoin/banding machinery around the dense-gram fallback legs and
#: the simhash band-alphabet scaling), then (c) the oldest r05-green
#: rows by registration order with the remaining slots.  Queries not
#: listed fall in registration order after these; the 7
#: no-oracle-by-design queries sit in _RUN_LAST so they never burn a
#: budget slot on a rows-only check while oracle debt exists.
_RUN_FIRST = [
    # (0) new in round 7, never driver-checked — protocol rule (a);
    # 3 new queries, at the round budget
    "multimodal_av", "quality_percentile_filter", "gram_novelty_scores",
    # (a) latest green row is r04 — two rounds stale, clear it all
    # (multimodal_features/decode also carry their round-7 merged
    # schemas, so this re-green checks the consolidation too)
    "funnel_users", "grouping_sets_priority_status", "json_props_agg",
    "last_week_threshold", "late_shipments", "lm_doc_scores",
    "moving_sum_rows_frame", "multimodal_decode", "multimodal_features",
    "nearest_click_event", "not_in_customers", "null_handling_demo",
    "orders_calendar", "percentile_prices", "pivot_status_counts",
    "q1_pricing_summary", "q3_segment_revenue", "rollup_merge_hourly",
    "sessionize_events", "skew_salted_user_totals",
    "text_bm25_topk_ranks", "tokens_posexplode", "window_rank_family",
    # (b) touched in round 7 — must re-green fresh
    "fuzzy_doc_pairs", "dedup_char_jaccard", "dedup_jaccard_prefix",
    "dedup_containment", "dedup_simhash", "dedup_minhash_lsh",
    # (c) oldest r05-green, registration order, filling the ~50 budget
    "bpe_encode_top_words", "canon_text_dedup", "chunk_documents",
    "decontaminate_ngrams", "decontaminate_ngrams8_planted",
    "dedup_embedding_clusters", "dedup_incremental", "dedup_keep_best",
    "dedup_repeated_spans", "dedup_source_overlap",
    "dq_constraint_violations", "dup_ngram_fraction",
    "gapfill_forward_fill", "mixture_sampling_rates",
    "pit_lookup_orders", "q5_nation_revenue", "range_frame_hour_sum",
    "range_join_hour_buckets",
    # (range_join_tumbling_rewrite and remove_boilerplate_lines — the
    # two oldest-r05 rows displaced by the 2 extra new queries — lead
    # round 8's stale list instead)
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
