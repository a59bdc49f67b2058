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
#: so the ordering IS the verification-freshness lever.  Round-4
#: rotation (verdict item 1, mechanical): (a) the 13 oracle-backed
#: queries that have NEVER had a driver row (r03's list put them at
#: positions 51+ and the budget cut at 50), then (b) the 6 whose last
#: green row is r01, then (c) everything touched or added in round 4,
#: then (d) the 45 queries last green in r02, oldest debt first.  The
#: r03-green queries fall in registration order after these; the 7
#: no-oracle-by-design queries sit in _RUN_LAST so they never burn a
#: budget slot on a rows-only check while oracle debt exists.
_RUN_FIRST = [
    # (a) oracle-backed, never driver-checked (all judge-local PASS r3)
    "dedup_char_jaccard", "dedup_embedding_lsh", "embedding_hof_norms",
    "grouping_sets_priority_status", "multimodal_audio",
    "multimodal_features", "multimodal_frames", "multimodal_resize",
    "rollup_merge_hourly", "skew_salted_user_totals",
    "text_bm25_topk_ranks", "tokens_posexplode", "window_rank_family",
    # (b) last green in r01
    "dedup_clusters", "dedup_jaccard_prefix", "dedup_minhash_lsh",
    "dedup_simhash", "multimodal_meta", "sessionize_events",
    # (c) touched in round 4 (ADVICE fixes: exact prefix bounds,
    # MERGE conflict resolution, struct-literal DQ gate, pool
    # pre-slice) — must re-green fresh
    "dedup_containment", "merge_upsert_orders",
    "dq_constraint_violations", "contrastive_negatives",
    # (c) new in round 4: LM doc scoring (CCNet-filter shape), BPE
    # pair counts (tokenizer induction), bidirectional nearest as-of
    "lm_doc_scores", "bpe_pair_counts", "nearest_click_event",
    # (d) last green in r02, nothing changed since
    "amount_diff_lag", "ann_cosine_topk", "ann_euclidean_topk",
    "anti_join_no_orders", "asof_last_click", "chain_fraud_window",
    "cube_status_priority", "dedup_embedding", "dedup_exact",
    "distinct_parts_per_flag", "dq_orders_profile", "funnel_users",
    "json_props_agg", "last_week_threshold", "late_shipments",
    "moving_sum_rows_frame", "multimodal_decode", "not_in_customers",
    "null_handling_demo", "orders_calendar", "percentile_prices",
    "pivot_status_counts", "q1_pricing_summary", "q3_segment_revenue",
    "q5_nation_revenue", "range_frame_hour_sum",
    "range_join_hour_buckets", "range_join_tumbling_rewrite",
    "rollup_status_priority", "scalar_subquery_acctbal",
    "semi_join_big_orders", "set_except_customers",
    "set_intersect_customers", "string_funcs_demo", "text_bm25_scaled",
    "text_fingerprint", "text_langid", "text_quality",
    "text_term_stats", "text_tokens", "tumbling_hourly",
    "union_labeled_rules", "window_lag_hop", "window_last_scd1",
    "window_lead_scd2",
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
