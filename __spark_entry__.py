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
#: so the ordering IS the verification-freshness lever.  Round-11
#: rotation (round-10 verdict item 1, mechanical; no new ledger
#: queries this round — the round's streaming face is a bench row +
#: stream≡batch test, not an oracle slot): (a) ALL 25 still-active
#: queries whose latest green row is r08 — two rounds stale, exactly
#: the round-10 verdict's list — then (b) queries whose code was
#: touched in round 11 (dedup_image_phash: the dHash kernel gained
#: truncation/top-down handling and the band guard now takes the
#: live cap), then (c) the oldest r09-green rows by registration
#: order with the remaining ~24 slots (the rest of the r09 cohort
#: rotates in round 12).  Queries not listed fall in registration
#: order after these; the 7 no-oracle-by-design queries sit in
#: _RUN_LAST so they never burn a budget slot on a rows-only check
#: while oracle debt exists.
_RUN_FIRST = [
    # (a) latest green row is r08 — two rounds stale, clear it all
    # (the round-10 verdict's 25, registration order)
    "argmax_order_per_customer", "order_keys_csv",
    "full_outer_user_hours", "window_nth_family",
    "split_leakage_safe", "dedup_exact", "dedup_simhash",
    "dedup_clusters", "knn_doc_graph", "text_langid", "text_quality",
    "text_tokens", "text_fingerprint", "text_term_stats",
    "text_bm25_scaled", "text_repetition", "dedup_embedding_lsh",
    "dedup_embedding_clusters", "sample_hash_stratified", "scrub_pii",
    "split_train_holdout", "remove_boilerplate_lines",
    "shard_and_order", "curation_funnel_counts", "table_diff_orders",
    # (b) code touched in round 11 — must re-green fresh
    # (phash: r11 build phase; fuzzy/bpe: the optimization phase's
    # shared-broadcast verify and vocab-sized loop partitioning —
    # both r10-green, re-led here because their plans changed)
    "dedup_image_phash", "fuzzy_doc_pairs", "bpe_encode_top_words",
    # (c) oldest r09-green, registration order, filling the ~50
    # budget (the rest of the r09 cohort rotates in round 12)
    "q1_pricing_summary", "q3_segment_revenue", "q5_nation_revenue",
    "pivot_status_counts", "moving_sum_rows_frame", "funnel_users",
    "last_week_threshold", "late_shipments", "window_rank_family",
    "dedup_incremental", "dedup_source_overlap", "dedup_containment",
    "dedup_keep_best", "dedup_minhash_lsh", "dedup_jaccard_prefix",
    "dedup_char_jaccard", "dedup_repeated_spans",
    "dup_ngram_fraction", "label_centroids_scaled",
    "embedding_quantize", "ann_cosine_topk", "ann_euclidean_topk",
    "dedup_embedding", "sessionize_events",
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
