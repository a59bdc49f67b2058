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
#: so the ordering IS the verification-freshness lever.  Round-10
#: rotation (round-9 verdict item 1, mechanical): (0) the NEW
#: round-10 query (image perceptual-hash near-dup), then (a) ALL 24
#: still-active queries whose latest green row is r07 — two rounds
#: stale, exactly the round-9 verdict's list minus the retired
#: range_join_hour_buckets — then (b) queries whose code changed in
#: round 10 (fuzzy_doc_pairs' freshness signature became a recursive
#: walk), then (c) the oldest r08-green rows by registration order
#: with the remaining ~24 slots (the rest of the r08 cohort rotates
#: in round 11).  Queries not listed fall in registration order
#: after these; the 7 no-oracle-by-design queries sit in _RUN_LAST
#: so they never burn a budget slot on a rows-only check while
#: oracle debt exists.
_RUN_FIRST = [
    # (0) new in round 10, never driver-checked
    "dedup_image_phash",
    # (a) latest green row is r07 — two rounds stale, clear it all
    # (the round-9 verdict's list, registration order)
    "range_frame_hour_sum", "percentile_prices", "null_handling_demo",
    "not_in_customers", "orders_calendar", "json_props_agg",
    "skew_salted_user_totals", "rollup_merge_hourly",
    "grouping_sets_priority_status", "text_bm25_topk_ranks",
    "gram_novelty_scores", "dq_constraint_violations",
    "pit_lookup_orders", "nearest_click_event",
    "gapfill_forward_fill", "mixture_sampling_rates",
    "canon_text_dedup", "tokens_posexplode", "decontaminate_ngrams",
    "decontaminate_ngrams8_planted", "chunk_documents",
    "lm_doc_scores", "bpe_encode_top_words",
    "quality_percentile_filter",
    # (b) code touched in round 10 — must re-green fresh
    "fuzzy_doc_pairs",
    # (c) oldest r08-green, registration order, filling the ~50
    # budget (the rest of the r08 cohort rotates in round 11)
    "q10_returned_items", "zorder_keys_orders", "q18_large_orders",
    "window_lead_scd2", "window_lag_hop", "window_last_scd1",
    "anti_join_no_orders", "semi_join_big_orders",
    "union_labeled_rules", "string_funcs_demo",
    "range_join_tumbling_rewrite", "scalar_subquery_acctbal",
    "set_intersect_customers", "set_except_customers",
    "amount_diff_lag", "rollup_status_priority",
    "cube_status_priority", "distinct_parts_per_flag",
    "tumbling_hourly", "asof_last_click", "asof_join_multikey",
    "chain_fraud_window", "unpivot_status_counts",
    "big_spenders_having",
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
