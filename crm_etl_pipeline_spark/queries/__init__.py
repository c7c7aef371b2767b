"""Query modules — importing this package fills registry.REGISTRY."""

from crm_etl_pipeline_spark.queries import (  # noqa: F401
    aggregates,
    bucketing_q,
    catalog_q,
    crm_q,
    decode_q,
    embeddings_q,
    events_q,
    gateway_q,
    joins,
    layout_q,
    llmops,
    multimodal_q,
    relational,
    scd_q,
    sketch_filters_q,
    sources_q,
    stats_q,
    streaming_q,
    transforms,
    windows,
)

# Queries the driver's bounded correctness prefix should check FIRST this
# round. Round-8 rotation: the first pure steady-state window (round-7
# verdict task 1). CORRECTNESS_r07 landed 50/50 green; after it the age
# distribution over the r1-r7 union is r7:50, r6:47, r5:45, r4:28 —
# zero queries older than r4. (Audit-trail correction, r7 verdict item:
# the round-7 block labeled its third segment "27 of the 50 r4 rows";
# the segment actually held 21 r4 refreshes — 6 of its 27 slots went to
# changed/new queries: schema_evolution_read, scd2_compact_small_files,
# ab_test_conversion, dq_audit_orders, wap_publish_roundtrip,
# streaming_rate_limit; language_temperature_sample took a 7th slot,
# ceding streaming_stateful_sessions' refresh to its twins.)
#
# This window, in verdict-ranked order: (a) the 8 r6-row embedding-family
# queries whose code+oracle the round-7 NULL-vector contract changed
# AFTER their last driver row — changed code outranks age; (b) all 28 r4
# rows (the oldest in the registry); (c) the 6 queries REGISTERED this
# round (never driver-checked: partition_evolution_regrain,
# scd2_expire_versions — the round-7 verdict's stretch item —
# multimodal_mp4_seek_plan, the driver-visible face of the stsc
# multi-chunk walk, zorder_range_scan, multi-column clustering
# with a bit-exact Morton-curve oracle, ann_pq_adc, product
# quantization + ADC, and audio_energy_windows, PCM energy/silence
# windows over the real WAV decode), plus the 2 changed-oracle
# r7 rows the dup_events fix touched (see the c2 note inline); (d) 6 of
# the 45 r5 rows, chosen one-per-family so every operator family gets a
# fresh representative: multimodal_decode_quarantine and
# csv_source_roundtrip first (their families' code/contracts changed
# this round — MP4 stsc walk and the nullValue-sentinel escape), then
# the tier-2 bench headliners (copurchase_pagerank,
# prefix_filter_setsim_join) and one delegate per remaining family.
# The six new registrations took the slots of rfm_segmentation (ceded
# to its in-window crm twin copurchase_pagerank), pps_systematic_sample
# (ceded to global_rank_two_phase, which proves the identical two-phase
# prefix-sum construction), bm25_topk_search (ceded to the
# in-window tfidf_top_terms r4 refresh — same postings/capped-heads
# family), cdc_derive_changes (ceded to its r6-green apply twin
# cdc_apply_snapshot, with two fresher scd rows in-window),
# incremental_agg_merge (ceded to the aggregate family's seven
# r7-fresh rows — see ann_pq_adc's inline note), and
# prefix_filter_setsim_join (ceded to the in-window simhash /
# lsh_bucket_profile r4 refreshes — see audio_energy_windows'
# inline note). The two
# changed-oracle swap-ins took the slots of streaming_moments_anomalies
# (streaming is covered in-window by streaming_scd2_state + the r4
# streaming_dlq/requeue/stateful_sessions refreshes) and
# partition_pruned_scan (layout is covered by zorder_range_scan,
# partition_evolution_regrain, and the r4 bucketed_join_colocated
# refresh). After this round every row is <= 3 rounds old — the
# designed steady state.
#
# The 39 r5 rows left out (all pytest-oracle-green at HEAD via
# tests/test_oracle.py; the round-9 window picks them up first): each is
# twin-covered in-window this round — approx_distinct_selfcheck /
# countmin_heavy_hitters / kmv_set_intersection by the sketch family's
# in-window delegate bm25's capped-heads shape and the r7-fresh
# kmv_distinct_sketch + approx_value_percentiles rows; attribution_last_touch,
# cohort_retention, funnel_conversion, event_transition_matrix,
# gapfill_daily_user_revenue, record_linkage_fuzzy, copurchase_lift_topk,
# incremental_agg_merge (by version_counts_per_key r7 + the kmv/approx
# sketch rows — the same mergeable-partials contract),
# prefix_filter_setsim_join (by the in-window simhash_near_dup /
# lsh_bucket_profile r4 refreshes + its r7-fresh shingle-join twin
# contamination_ngram_overlap),
# chi_square_segment_nation, benford_price_audit, rfm_segmentation by
# the crm delegate copurchase_pagerank; histogram_equi_depth,
# ols_frequency_monetary, robust_outliers_mad, winsorize_event_values,
# ewma_user_value, shipping_delay_audit, pps_systematic_sample by
# global_rank_two_phase (exact-moment column algebra + the identical
# two-phase prefix-sum construction);
# backoff_penalty_audit by credential_rotation_schedule (gateway);
# bloom_semi_join_prune / regional_supplier_volume by the in-window r4
# join refreshes; streaming_dlq_replay / streaming_stream_stream_join /
# streaming_late_data_audit / streaming_moments_anomalies by the
# in-window streaming_scd2_state (fresh under the dup contract) +
# the r4 streaming_dlq/streaming_requeue/stateful_sessions refreshes;
# cdc_derive_changes
# by its r6-fresh apply twin cdc_apply_snapshot; scd2_asof_snapshot is
# IN-window (time travel has no twin); bm25_topk_search /
# boilerplate_line_removal /
# repeated_span_mining / token_rarity_score / inverted_index_postings /
# dedup_incremental_new_docs / pii_redaction by
# the r4 tfidf/pack/doc_repetition refreshes; keyset_pagination_orders
# and partition_pruned_scan by the in-window layout members
# (zorder_range_scan, partition_evolution_regrain, and the r4
# bucketed_join_colocated refresh — same footer/partition-pruning
# machinery).
#
# Late-round-8 changed-code ledger (the c2 precedent: changed rows the
# full window cannot absorb defer to the NEXT round's priority #1,
# with the clean-fixture hash-unchanged proof pinned at HEAD): the
# variance-residual clamp (sqrt(greatest(0, .)), const_vec sweep
# finding) touched event_value_anomalies + streaming_moments_anomalies
# (embedding_standardize, same fix, is already in-window at (a)), and
# the _casefold simple-mapping contract (unicode_text sweep finding)
# plus the explicit _WS_CLASS whitespace set (whitespace_storm
# finding: Java \s includes \x0B, RE2's does not) touched
# exact_dedup_documents + token_profile +
# dedup_incremental_new_docs; the epoch-micros Arrow-boundary contract
# (far_future_ts finding: one year-2400 clock-skew row killed the
# applyInPandas stages via the pandas ns cast) touched ewma_user_value
# (streaming_stateful_sessions, same fix, is already in-window at
# (b)). All six are pytest-oracle-green AND
# driver-contract-simulated at HEAD with clean-fixture hashes
# unchanged (the clamp, the pre-translation, and the micros
# round-trip are no-ops on the all-ASCII, in-range, non-degenerate
# driver fixture); they are round-9 window
# priority #1, ahead of the r5 rotation.
#
# registry.load_all reorders REGISTRY to put these at the front; the rest
# follow in module order. Keep this list <= 50
# (test_driver_priority_window enforces the fit).
DRIVER_PRIORITY: list[str] = [
    # --- (a) the 8 NULL-vector-contract embedding queries (changed
    # code after their last driver row; the rest of the family was
    # driver-certified under the new contract in r7) ---
    "ann_cosine_topk",
    "ann_lsh_bucketed",
    "ann_ivf_probe",
    "ann_ivf_nprobe2",
    "embedding_standardize",
    "embedding_kmeans",
    "embedding_centroid_per_label",
    "embedding_norm_topk",
    # --- (b) all 28 r4 rows, oldest in the registry ---
    "asof_join_latest_order",
    "bucketed_join_colocated",
    "correlated_min_cost_supplier",
    "disjunctive_filter_scan",
    "doc_repetition_ratio",
    "exists_returned_lineitems",
    "lag_order_gap_days",
    "latest_order_per_customer",
    "lsh_bucket_profile",
    "multimodal_manifest",
    "multimodal_features",
    "multimodal_real_decode",
    "multimodal_frame_sample",
    "ntile_order_value_quartiles",
    "pack_training_sequences",
    "percent_rank_acctbal",
    "range_join_clicks_before_purchase",
    "running_revenue",
    "salted_user_event_totals",
    "scd2_versioned_store",
    "simhash_near_dup",
    "sliding_1h_user_value",
    "streaming_dlq",
    "streaming_requeue",
    "streaming_stateful_sessions",
    "tfidf_top_terms",
    "topk_orders_by_revenue",
    "topk_per_group",
    # --- (c) registered this round, never driver-checked ---
    "partition_evolution_regrain",
    "scd2_expire_versions",
    # the driver-visible face of the round-8 stsc multi-chunk walk
    # (takes bm25_topk_search's delegate slot — retrieval is covered
    # in-window by the tfidf_top_terms r4 refresh, and bm25 itself by
    # the r7-fresh sketch/agg rows sharing its capped-heads shape)
    "multimodal_mp4_seek_plan",
    # Z-order clustering (takes cdc_derive_changes' delegate slot —
    # its apply twin cdc_apply_snapshot is r6-green and the scd family
    # has two fresher rows in-window)
    "zorder_range_scan",
    # PQ codebooks + ADC compressed-domain scan, registered late in
    # round 8 (takes incremental_agg_merge's delegate slot — the
    # aggregate family holds SEVEN r7-fresh driver rows incl. its
    # mergeable-partials twin version_counts_per_key and the
    # kmv/approx-percentile sketch rows proving the same
    # partial/merge contract; incremental_agg_merge itself stays
    # pytest-oracle-green at HEAD and rejoins in round 9)
    "ann_pq_adc",
    # audio PCM energy/silence windows over the REAL WAV decode,
    # registered late in round 8 (takes prefix_filter_setsim_join's
    # delegate slot — setsim's banded-candidate family is covered
    # in-window by the simhash_near_dup + lsh_bucket_profile r4
    # refreshes and its r7-fresh shingle-join twin
    # contamination_ngram_overlap; setsim itself stays
    # pytest-oracle-green at HEAD, keeps its tier-2 bench row, and
    # rejoins in round 9)
    "audio_energy_windows",
    # --- (c2) the dup_events sweep fix changed _STORE_SQL (the
    # identity-dedup DISTINCT), altering EIGHT scd-family oracles after
    # their last driver row. Three were already in-window
    # (scd2_versioned_store, scd2_asof_snapshot, scd2_expire_versions);
    # these two join them because their Spark paths are independent
    # (the streaming pipeline store; the compaction fold whose oracle
    # is the store SQL verbatim). The remaining changed rows are
    # round-9 window priority #1, all pytest-proven hash-unchanged on
    # clean fixtures at HEAD (every dedup DISTINCT/dropDuplicates is a
    # no-op without duplicated rows): scd2_current_view,
    # scd2_soft_delete, scd2_store_roundtrip (dup_events oracle fix),
    # minhash_near_dup + multimodal_byte_dedup +
    # boilerplate_line_removal (dup_docs identity-dedup fix; minhash's
    # change is oracle-only), kmeans_cluster_purity +
    # embedding_near_dup (dup_embs vec_id-identity fix).
    # lsh_bucket_profile's and embedding_kmeans's matching changes are
    # covered in-window by their slots above.
    "streaming_scd2_state",
    "scd2_compact_small_files",
    # --- (d) 12 r5 family delegates (changed-family members first) ---
    "multimodal_decode_quarantine",
    "csv_source_roundtrip",
    "copurchase_pagerank",
    "credential_rotation_schedule",
    "scd2_asof_snapshot",
    "global_rank_two_phase",
]
