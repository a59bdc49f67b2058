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
#: so the ordering IS the verification-freshness lever.  Round-9
#: rotation (round-8 verdict item 1, mechanical): (0) the three NEW
#: round-9 queries (hashed-line paragraph dedup twin, the
#: streaming-rollup cumulative-users twin, mixture application),
#: then (a) ALL 23 queries whose latest green row is r06 — two
#: rounds stale, exactly the list the round-8 verdict names — then
#: (b) queries whose code or ORACLE changed in round 9
#: (dedup_paragraphs' oracle gained the empty-doc coalesce;
#: fuzzy_doc_pairs' routing memo gained the freshness key), then
#: (c) the oldest r07-green rows by registration order with the
#: remaining ~22 slots.  Queries not listed fall in registration
#: order after these; the 7 no-oracle-by-design queries sit in
#: _RUN_LAST so they never burn a budget slot on a rows-only check
#: while oracle debt exists.
_RUN_FIRST = [
    # (0) new in round 9, never driver-checked
    "dedup_paragraphs_hashed", "cumulative_users_rollup_merge",
    "mixture_apply_sample",
    # (a) latest green row is r06 — two rounds stale, clear it all
    # (the round-8 verdict's list, registration order)
    "ann_cosine_topk", "ann_euclidean_topk", "contrastive_negatives",
    "covar_components_events", "cumulative_distinct_users",
    "dedup_embedding", "dq_orders_profile", "embedding_hof_norms",
    "embedding_quantize", "histogram_orders", "key_skew_profile",
    "label_centroids_scaled", "lang_quota_sample",
    "merge_upsert_orders", "outlier_iqr_events",
    "padding_waste_by_order", "rank_fusion_rrf", "resample_ohlc",
    "retention_cohorts", "sessionize_native_window",
    "stats_moments_events", "topk_docs_per_lang",
    "vocab_topk_coverage",
    # (b) oracle/code touched in round 9 — must re-green fresh
    "dedup_paragraphs", "fuzzy_doc_pairs",
    # (c) oldest r07-green, registration order, filling the ~50
    # budget (the rest of the r07 cohort rotates in round 10)
    "late_shipments", "moving_sum_rows_frame", "window_rank_family",
    "pivot_status_counts", "last_week_threshold",
    "q1_pricing_summary", "q3_segment_revenue", "q5_nation_revenue",
    "multimodal_av", "multimodal_decode", "multimodal_features",
    "sessionize_events", "dedup_minhash_lsh", "dedup_jaccard_prefix",
    "dedup_char_jaccard", "dedup_containment", "dedup_incremental",
    "dedup_keep_best", "dedup_source_overlap", "dup_ngram_fraction",
    "funnel_users", "dedup_repeated_spans", "gapfill_forward_fill",
    "gram_novelty_scores", "quality_percentile_filter",
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
