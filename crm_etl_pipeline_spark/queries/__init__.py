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

# Queries the driver's bounded correctness prefix should check FIRST
# this round. Round-13 rotation, executing the round-12 verdict's
# ranked tasks 1-2 verbatim:
#
# CORRECTNESS_r12 landed 50/50 green; the age distribution over the
# r1-r12 union is r12:50, r11:47, r10:48, r9:39, r8:2 — 186 queries
# ever checked, zero latest-check failures, and exactly one
# registered query (bigram_lm_quality_filter) never yet in a window.
#
# This window, in verdict-ranked order:
#   (a) never-driver-checked + changed code + new registrations
#       (changed code outranks age, per the standing precedent):
#       - bigram_lm_quality_filter FIRST: the only registered query
#         with no CORRECTNESS row ever (verdict task 1, promised by
#         name at its round-12 late-registration note); its code also
#         changed this round (the \z token-gate anchor closing the
#         trailing-line-terminator divergence, and the null-safe
#         n_pairs corpus-mean attach key — both round-12 ADVICE
#         closes, sweep-certified on the new whitespace_storm
#         trailing-terminator frames);
#       - bpe_merge_training: its token gate changed to the same \z
#         anchor and its body was refactored into the shared
#         _bpe_words/_bpe_train helpers (oracle text changed too:
#         shared _BPE_TRAIN_CTES fragment) — pytest-oracle-green and
#         11-batch sweep-certified at the new HEAD;
#       - streaming_incremental_dedup: NEW — the streaming x dedup
#         crossover (ingest-time first-arrival exact dedup:
#         readStream -> per-batch hash collapse -> null-safe store
#         anti-join -> append), 12 document sweep batches, invariant
#         test proving the first-arrival winner differs from the
#         batch recompute's min-id rule on this fixture;
#       - bpe_encode, pack_bpe_sequences, bpe_subword_vocab: NEW (the
#         round-12 verdict's growth slot #5, closing the tokenizer
#         train->encode->pack loop, plus the trained-vocabulary
#         artifact); textbook-reference-tested against an independent
#         pure-Python train+encode+pack, 11 document sweep batches
#         each, full DuckDB oracles sharing the trainer's CTE chain.
#       Changed code NOT in the window, hash-unchanged-proven:
#       streaming.pmod_chunk_relay gained an optional ``key`` param
#       for the document ingest harness; the default preserves the
#       event_id contract byte-for-byte, and both existing consumers
#       are covered at this HEAD (streaming_zorder_ingest re-verified
#       through the entry contract this round, hash-match at sf0.01;
#       streaming_dim_enrichment oracle-green in the full pytest run).
#       Changed code NOT in the window (the round-12 precedent),
#       each hash-unchanged-proven at the driver SF: embedding_kmeans,
#       kmeans_cluster_purity and ann_pq_adc gained spelled NULLS
#       FIRST seed windows (the round-13(e) null_vec_ids batch find —
#       value-identical at sf0.01 where no NULL vec_id exists;
#       full-hash oracle pytest green at HEAD, 15/15 batch-certified).
#       All three are r10-tier rows: round 14's natural window takes
#       them WITH their changed-code priority. The same audit then
#       spelled the two remaining unspelled hash-rank windows
#       (weighted_sample_allocation, r10-tier — same round-14 path)
#       and gave sample_stratified_hashrank (r12-fresh) the text
#       tiebreak closing the second-order complete-tie split — both
#       full-hash pytest- AND entry-contract-green at sf0.01 at this
#       HEAD, probe-certified on null_doc_ids + id_collision_docs;
#       sample_stratified_hashrank leads the round-14 changed-code
#       slots — joined by the const_ts_null_ids closes: fifo_head
#       (r10-tier), event_transition_matrix (r9 — IN this window, so
#       its changed code is window-covered), and the _STORE_SQL
#       placement spelling, which changes the ORACLE TEXT of the whole
#       scd2 family (versioned_store, current_view, asof_snapshot,
#       expire_versions, store_roundtrip, soft_delete, compact,
#       streaming_scd2_state) — every one full-hash pytest-green at
#       sf0.01 at this HEAD (no NULL event_id / tied-ts storm exists
#       in the driver fixtures) and re-certified by the const_ts,
#       null_event_ids, dup_events and far_future_ts batches. The
#       orders composition closed the axis: keyset_pagination_orders
#       (IN this window — changed code window-covered: NULL keys now
#       excluded by the keyset contract) and lag_order_gap_days
#       (r12-fresh; placement spelled — joins the round-14
#       changed-code slots), both full-hash green at sf0.01.
#   (b) the 39 r9 rows — 4 driver-rounds stale after this round if
#       skipped (the repo's own ceiling); verdict task 2.
#   (c) the two r8 defers, age 4 THIS round, promised by name at
#       their round-12 defer notes: topk_per_group,
#       percent_rank_acctbal (verdict task 2).
#   (d) 3 changed-code/changed-oracle rows from the round-13(d)
#       null_doc_ids sweep batch (changed code outranks the
#       pre-rotation headroom that previously filled these slots):
#       pack_training_sequences + language_temperature_sample gained
#       spelled NULLS FIRST placements in their oracle ORDER BYs
#       (md5(CAST(NULL)) is a NULL key; Spark's ASC default is NULLS
#       FIRST, DuckDB's is NULLS LAST — the batch caught both), and
#       boilerplate_line_removal's doc-key assembly joins went
#       null-safe in both engines (a NULL-id winner vanished from the
#       plain inner equi-join). All three (and pack_bpe_sequences,
#       already in (a)) are full-hash pytest-oracle-green at sf0.01 at
#       this HEAD — the driver fixtures carry no NULL doc_ids, so the
#       changes are value-identical there; the new batch certifies the
#       NULL-id behavior (21/21 OK after the fixes).
#
# Age accounting if this window lands 50/50: registry 187 -> 191,
# r13:50, r12:46, r11:47, r10:48, r9:0 tier cleared, r8:0 — max age 3
# rounds, no query past the ceiling, every registered query
# driver-checked at least once. Round 14's natural window is the 48
# r10 rows + changed-code slots (the two-defer precedent covers the
# overflow if registrations land).
#
# registry.load_all reorders REGISTRY to put these at the front; the
# rest follow in module order. Keep this list <= 50
# (test_driver_priority_window enforces the fit).
DRIVER_PRIORITY: list[str] = [
    # --- (a) never-checked first, then changed code / new ---
    "bigram_lm_quality_filter",
    "bpe_merge_training",
    "bpe_encode",
    "pack_bpe_sequences",
    "bpe_subword_vocab",
    "streaming_incremental_dedup",
    # --- (b) the 39 r9 rows, age 4 after this round if skipped ---
    "approx_distinct_selfcheck",
    "attribution_last_touch",
    "benford_price_audit",
    "bloom_semi_join_prune",
    "bm25_topk_search",
    "catalog_tree",
    "cdc_derive_changes",
    "chi_square_segment_nation",
    "cohort_retention",
    "copurchase_lift_topk",
    "countmin_heavy_hitters",
    "dedup_incremental_new_docs",
    "event_transition_matrix",
    "event_value_anomalies",
    "ewma_user_value",
    "exact_dedup_documents",
    "funnel_conversion",
    "gapfill_daily_user_revenue",
    "histogram_equi_depth",
    "incremental_agg_merge",
    "inverted_index_postings",
    "keyset_pagination_orders",
    "kmv_set_intersection",
    "multimodal_byte_dedup",
    "ols_frequency_monetary",
    "pii_redaction",
    "pps_systematic_sample",
    "record_linkage_fuzzy",
    "regional_supplier_volume",
    "rfm_segmentation",
    "robust_outliers_mad",
    "shipping_delay_audit",
    "streaming_dlq_replay",
    "streaming_late_data_audit",
    "streaming_moments_anomalies",
    "streaming_stream_stream_join",
    "token_profile",
    "token_rarity_score",
    "winsorize_event_values",
    # --- (c) the two age-4 r8 defers, promised by name ---
    "topk_per_group",
    "percent_rank_acctbal",
    # --- (d) changed-code rows from the null_doc_ids batch ---
    "pack_training_sequences",
    "language_temperature_sample",
    "boilerplate_line_removal",
]
