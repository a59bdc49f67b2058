"""Public library API — the one-stop import surface for users
switching from the reference warehouse.

Batch warehouse::

    from greenplum_dwh_spark import api
    spark = api.get_spark()
    wh = api.Warehouse(spark, "/data/wh")
    api.load_landing_file(wh, "transactions_03052020.parquet")
    api.normalize_transactions(wh)          # fn_normalize_transactions()
    api.add_report_data(wh, "scd2")         # fn_add_report_data('scd2')
    api.report_pivot(wh.read("report"))     # plot_report.py pivot

Training-data operators (DataFrame-level)::

    api.exact_dedup(docs)                # hash dedup
    api.minhash_pairs(docs)              # near-dup pairs, LSH + verify
    api.keep_best_per_cluster(docs)      # cluster + survivor policy
    api.connected_components(pairs)      # generic edge-list clustering
    api.simhash_pairs(docs)              # hamming near-dups
    api.jaccard_prefix_pairs(docs)       # exact set-similarity join
    api.cosine_topk(queries, corpus)     # exact ANN
    api.kmeans_centroids(embeddings)     # IVF coarse quantizer
    api.sessionize(events)               # session assignment
    api.pack_payloads(docs)              # multimodal binary columns
    api.extract_features(packed)

Streaming::

    api.stream_landing / api.stream_expired_rules /
    api.stream_sessionize / api.stream_chain_detector /
    api.stream_tumbling_counts / api.run_streaming_mart /
    api.stream_dedup / api.stream_decontaminate /
    api.asof_enrich_foreach_batch (streaming PIT enrichment) /
    api.neardup_ingest_foreach_batch (continuous near-dup corpus
    ingestion vs a growing LSH band index)

Curation / reconciliation::

    api.chunk_docs(docs)                 # context-window chunking
    api.shard_order(docs)                # deterministic shard + order
    api.lm_score(docs)                   # LM quality scoring (CCNet)
    api.table_diff(a, b, key, cols)      # snapshot reconciliation
    api.merge_upsert(target, changes, k) # MERGE INTO semantics
    api.asof_join(facts, versions, ...)  # point-in-time lookup
    api.nearest_join(facts, versions, .) # bidirectional nearest as-of
    api.incremental_minhash_pairs(...)   # new-vs-corpus dedup
    api.leakage_safe_split(docs)         # cluster-aware splits
    api.source_overlap_matrix(docs)      # cross-source dup audit
    api.zorder_key2(a, b)                # Morton layout key
    api.cdc_apply_foreach_batch(...)     # streaming CDC MERGE
"""

from greenplum_dwh_spark.etl.normalize import normalize_transactions  # noqa: F401
from greenplum_dwh_spark.functions.skew import (salted_count_sum,  # noqa: F401
                                                salted_join)
from greenplum_dwh_spark.mart.chains import detect_chains_pd  # noqa: F401
from greenplum_dwh_spark.mart.report import (add_report_data,  # noqa: F401
                                             plot_report, report_pivot)
from greenplum_dwh_spark.multimodal.codec import (decode_image,  # noqa: F401
                                                  extract_features,
                                                  pack_payloads)
from greenplum_dwh_spark.functions.sketch import (kmv_estimate,  # noqa: F401
                                                  kmv_merge, kmv_sketch)
from greenplum_dwh_spark.operators.dedup import (  # noqa: F401
    connected_components, containment_pairs, drop_repeated_span_dups,
    exact_dedup, incremental_minhash_pairs,
    jaccard_prefix_pairs, keep_best_per_cluster, leakage_safe_split,
    minhash_pairs, neardup_clusters, repeated_spans, simhash_pairs,
    source_overlap_matrix)
from greenplum_dwh_spark.operators.curation import (chunk_docs,  # noqa: F401
                                                     lm_score,
                                                     shard_order)
from greenplum_dwh_spark.operators.packing import (pack_batches,  # noqa: F401
                                                   padding_waste)
from greenplum_dwh_spark.operators.reconcile import (merge_upsert,  # noqa: F401
                                                     table_diff)
from greenplum_dwh_spark.operators.patterns import match_pattern  # noqa: F401
from greenplum_dwh_spark.operators.quality import (  # noqa: F401
    constraint_violations)
from greenplum_dwh_spark.operators.rollup_store import HourlyRollup  # noqa: F401
from greenplum_dwh_spark.operators.sessions import (sessionize,  # noqa: F401
                                                    sessionize_pd)
from greenplum_dwh_spark.operators.similarity import (cosine_topk,  # noqa: F401
                                                      kmeans_centroids)
from greenplum_dwh_spark.session import get_spark  # noqa: F401
from greenplum_dwh_spark.sources.landing import (load_landing_file,  # noqa: F401
                                                 read_extract)
from greenplum_dwh_spark.sql import (register_testdata,  # noqa: F401
                                     register_warehouse)
from greenplum_dwh_spark.functions.zorder import zorder_key2  # noqa: F401
from greenplum_dwh_spark.operators.timeseries import (asof_join,  # noqa: F401
                                                      nearest_join)
from greenplum_dwh_spark.streaming.mart_stream import (  # noqa: F401
    asof_enrich_foreach_batch, cdc_apply_foreach_batch,
    kmv_sketch_foreach_batch, neardup_ingest_foreach_batch,
    stream_chain_detector, stream_decontaminate, stream_dedup,
    stream_expired_rules, stream_landing, stream_sessionize,
    stream_tumbling_counts)
from greenplum_dwh_spark.streaming.pipeline import (  # noqa: F401
    run_streaming_mart)
from greenplum_dwh_spark.warehouse import Warehouse  # noqa: F401
