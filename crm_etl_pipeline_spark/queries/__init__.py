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
# round. Round-10 rotation (the round-9 verdict's task 1, executed
# verbatim, plus this round's own changed-code rows). CORRECTNESS_r09
# landed 50/50 green; after it the age distribution over the r1-r9
# union is r9:50, r8:50, r7:42, r6:34, r5:1 — 177 queries ever
# checked, zero latest-check failures.
#
# This window, in verdict-ranked order:
#   (a) the 23-row round-9 deferred changed-code ledger (changed code
#       outranks age; each was pytest-proven hash-unchanged or
#       symmetrically-changed on clean fixtures at HEAD when deferred,
#       per the c2 precedent — the full rationale lives in the round-9
#       preamble, preserved in git history at 23483d3):
#       - rate_limit_admission (code+oracle: the hour-stage
#         filter+join-back on event_id cross-matched byte-identical
#         at-least-once re-sends; rewritten as a self-inclusive
#         running conditional count in BOTH engines, which also drops
#         a shuffle join) and streaming_rate_limit (oracle-only —
#         _ADMISSION_SQL is shared verbatim);
#       - the 7 multimodal rows under the fabricate-width fix (the
#         column-less repartition(defaultParallelism) idiom that
#         un-coalesced the codec stage: 45.5 s -> 5.2 s at sf10) and
#         the MP4 elst edit-list fixture revision (every post-tkhd
#         offset +36; seek plans gained pt_ticks/presented):
#         multimodal_manifest, multimodal_features,
#         multimodal_real_decode, multimodal_frame_sample,
#         multimodal_decode_quarantine, multimodal_mp4_seek_plan,
#         audio_energy_windows;
#       - the 12 embedding rows under the round-9 non-finite
#         contract (one NaN/Inf component crashed 13/13 embedding
#         queries in both engines until _emb + all oracle scans
#         gained the finite-components predicate): ann_cosine_topk,
#         ann_lsh_bucketed, ann_ivf_probe, ann_ivf_nprobe2,
#         ann_pq_adc, ann_ivf_persisted_index, embedding_standardize,
#         embedding_quantize_int8, embedding_centroid_per_label,
#         embedding_norm_topk, embedding_kmeans,
#         knn_label_disagreement;
#       - salted_user_event_totals + tumbling_daily_counts under the
#         extreme-magnitude oracle edits (DECIMAL(19,2) widen /
#         VARCHAR-routed edge cast).
#   (b) this round's OWN changed-code rows (round-10 advisor fixes,
#       commit 67ed3e6; all pytest-oracle-green and
#       driver-sim-verified at HEAD):
#       - backoff_penalty_audit (code+oracle: the attempts ladder is
#         now all-double FLOOR(ABS(value) % 12) on both sides — the
#         round-9 ABS(FLOOR(v)) % 12 still materialized
#         floor(double)->LONG in Spark, ANSI-overflowing beyond
#         ~9.2e18; the fix also found that DuckDB's fmod() FUNCTION
#         is an inexact kernel while its % operator is exact IEEE
#         fmod — the oracle uses %. No-op at clean and current-probe
#         magnitudes: all are integral, where the two ladders agree);
#       - kmeans_cluster_purity + embedding_near_dup (oracle+code:
#         the NULL-component contract — x IS NULL joined isnan/isinf
#         in _emb and all 14 oracle scans; these two are the only
#         embedding rows NOT already in segment (a), which absorbs
#         the other 12 under the same edit). No-op on clean fixtures
#         (no NULL components there); the null_component_embeddings
#         sweep batch and
#         test_null_component_embedding_rows_are_excluded_everywhere
#         pin the degenerate agreement.
#   (b2) utf8_ingest_quarantine, REGISTERED this round (never
#       driver-checked = highest priority after changed code): the
#       round-9 verdict's task 3 — the malformed multi-byte UTF-8
#       probe, resolved as an ingest-boundary contract. The probe
#       measured the raw engine behaviors (DuckDB task-fails at
#       read_parquet on an invalid-UTF8 string column; Spark scans
#       byte-wise-tolerantly; Spark's ANSI decode crashes the stage;
#       the two binary->string CASTs don't even share semantics), so
#       wire text must enter as BINARY through an explicit
#       validate-or-quarantine gate: Spark try_validate_utf8
#       intrinsic, DuckDB an RFC 3629 RE2 regex over hex(payload).
#       Engine facts pinned in
#       tests/test_sources.py::test_utf8_wire_contract_engine_facts;
#       six document sweep batches extended with the new query.
#   (b3) streaming_zorder_ingest, REGISTERED this round (never
#       driver-checked): the round-9 verdict's stretch item 7 —
#       streaming ingest into the Z-ordered store (readStream →
#       seg-partitioned foreachBatch deltas → incremental curve
#       compaction), sharing layout_q.ZCURVE_ORACLE_SQL verbatim with
#       its batch twin (ingest-path invariance is the contract;
#       structural pins in tests/test_streaming.py::
#       test_zorder_ingest_stream_micro_batches_and_delta_shape). Its
#       slot comes from ceding event_type_routing (r6) to round 11 —
#       see the defer list in (d).
#   (c) partition_pruned_scan — the registry's oldest driver row (r5),
#       ceded its round-9 slot to the zorder_incremental_compact
#       registration with a documented cede note; rotates now, as that
#       note promised.
#   (d) 21 of the 33 remaining r6 rows (the oldest tier after (c)),
#       oldest-first fill. The 12 r6 rows deferred to round 11, each
#       with a named in-window-or-fresher twin exercising the same
#       machinery meanwhile (all 11 are pytest-oracle-green at HEAD
#       via tests/test_oracle.py):
#       join_full_outer + join_left_missing (join_anti / join_semi /
#       join_fk_enrichment are in-window; bucketed/asof/range joins
#       r8-fresh), catalog_fields_tree (catalog_tree r9-certified;
#       catalog_drift in-window), histogram_order_values
#       (histogram_equi_depth r9), orc_source_roundtrip
#       (json_source_roundtrip in-window; csv_source_roundtrip r8
#       under the shared escape contract), kmv_sketch_merge
#       (kmv_set_intersection r9), decile_gains_table
#       (abc_pareto_classification in-window; rfm_segmentation r9),
#       composite_key_roundtrip (return_type_fallback in-window, same
#       catalog machinery), mom_revenue_growth (cohort_retention r9),
#       pearson_correlation_matrix (chi_square_segment_nation +
#       ols_frequency_monetary r9), triangle_count
#       (copurchase_pagerank r8-fresh graph twin), event_type_routing
#       (ceded to the streaming_zorder_ingest registration at (b3);
#       its routing machinery is twin-covered by the in-window
#       fifo_head + event_dedup_last_write_wins and the r9-fresh
#       streaming_dlq_replay, and its const_etype sweep batch ran OK
#       at the round-9 final HEAD).
#
# Age accounting if this window lands 50/50: r10:50 (incl. the two
# new registrations), r9:39, r8:43, r7:34, r6:12 — max age 4 rounds
# only for the 12 documented defers above (each twin-covered),
# satisfying the round-9 verdict's "no row should predate r7 except
# by documented cede".
#
# Round-10 changed-code ledger (c2 precedent — changed rows this full
# window cannot absorb defer to round 11's priority #1, with the
# clean-fixture hash-unchanged proof pinned at HEAD):
# (1) zorder_incremental_compact's grain expression was parameterized
# (ZGRAIN_UBUCKET/ZSEG_SHIFT env knobs for the scale harness, commit
# 9f02760); defaults reproduce the registered grain byte-for-byte
# (test_zcurve_grain_knobs_default_to_registered_behavior) and the
# query re-verified full-hash at sf0.01 under defaults at HEAD. Its
# oracle/code pair is shared with streaming_zorder_ingest, which IS
# in this window and gets driver-certified under the new code; the
# batch twin rotates into round 11's window as priority #1.
# (2) The identity-collision contract (the round-10 id_collision_docs
# probe find — SAME doc_id, DIFFERENT bytes — split four pipelines
# cross-engine): identity-grain document loaders now resolve one
# deterministic winner per doc_id (llmops._one_per_doc /
# _DOCS_ONE_SQL, mirrored in the oracles). Ten rows changed:
# minhash_near_dup, lsh_bucket_profile, ngram_jaccard_verify,
# simhash_near_dup, dedup_components, repeated_span_mining,
# prefix_filter_setsim_join (via the shared _near_corpus /
# _NEAR_CORPUS_SQL chokepoint), boilerplate_line_removal,
# curation_pipeline, pack_training_sequences (their own loaders).
# Hash-unchanged on clean fixtures (no collisions there; byte-dup
# rows pick the same winner the round-8 DISTINCT did): all ten are
# pytest-oracle-green at HEAD, the id_collision_docs batch runs 18/18
# OK, and tests/test_llmops.py::test_identity_collision_contract pins
# the degenerate agreement. All ten join round 11's priority #1.
# (3) The identity-collision contract's VECTOR twin (id_collision_embs
# probe: same vec_id, different embedding — tied the hash-rank seed
# orderings, so the engines trained k-means/PQ on different seed
# vectors): training loaders resolve one deterministic winner per
# vec_id (embeddings_q._one_per_vec / the raw_emb winner CTE, ASC
# NULLS FIRST on the vector payload — array ordering agrees
# cross-engine). Serving scans stay winner-free by design (per-row
# symmetric; a window would wreck their scan-only plans) — the batch
# certifies both groups 14/14 OK, and id_collision_events ran 20/20
# OK with NO fix needed (the (ts, event_id, value)-keyed event
# pipelines are already collision-deterministic). The three changed
# rows — embedding_kmeans, kmeans_cluster_purity, ann_pq_adc — are
# ALREADY in this window (segments (a)/(b)) and get driver-certified
# under the new code; hash-unchanged on clean fixtures
# (test_oracle 3/3 green at HEAD;
# tests/test_stats.py::test_embedding_identity_collision_contract
# pins the degenerate agreement).
# (4) The contract's final two id spaces (id_collision_orders ×16:
# clean, no fix needed; id_collision_customer ×25): customer is the
# CRM item table, so a collided c_custkey (a) fanned out flagship's
# customer join, splitting its plain count from the oracle's
# COUNT(DISTINCT) — the customer dim now resolves one deterministic
# winner per key (MIN segment, map-side combinable, in-band in the
# full-bench protocol: flagship 0.550, tier-1 6.656) — and (b) put
# two base rows behind one (item_id, BASE_TS, 0) version identity
# with different values, an untiebreakable version-order coin flip;
# scd.scd2_apply's identity collapse is now a deterministic
# per-column MIN winner (the SAME shuffle the old subset-
# dropDuplicates paid — which itself picked an ARBITRARY survivor,
# a latent Spark-side nondeterminism — zero new stages: in-band
# scd2_versioned_store 0.346), mirrored by MIN(value) GROUP BY
# identity in the shared _STORE_SQL all_v CTE (subsumes the round-8
# DISTINCT: MIN of equal rows is the row). Changed rows:
# flagship_segment_revenue + the 8 _STORE_SQL/_base consumers
# (scd2_versioned_store, scd2_current_view, scd2_soft_delete,
# scd2_store_roundtrip, scd2_asof_snapshot, scd2_expire_versions,
# scd2_compact_small_files, streaming_scd2_state). Hash-unchanged on
# clean fixtures (unique keys; 16 oracle/scd/streaming tests green at
# HEAD); tests/test_scd.py::test_customer_identity_collision_contract
# pins the degenerate agreement. All nine join round 11's
# priority #1 alongside ledger entries (1)-(2).
#
# registry.load_all reorders REGISTRY to put these at the front; the rest
# follow in module order. Keep this list <= 50
# (test_driver_priority_window enforces the fit).
DRIVER_PRIORITY: list[str] = [
    # --- (a) the 23-row round-9 deferred changed-code ledger ---
    "rate_limit_admission",
    "streaming_rate_limit",
    "multimodal_manifest",
    "multimodal_features",
    "multimodal_real_decode",
    "multimodal_frame_sample",
    "multimodal_decode_quarantine",
    "multimodal_mp4_seek_plan",
    "audio_energy_windows",
    "ann_cosine_topk",
    "ann_lsh_bucketed",
    "ann_ivf_probe",
    "ann_ivf_nprobe2",
    "ann_pq_adc",
    "ann_ivf_persisted_index",
    "embedding_standardize",
    "embedding_quantize_int8",
    "embedding_centroid_per_label",
    "embedding_norm_topk",
    "embedding_kmeans",
    "knn_label_disagreement",
    "salted_user_event_totals",
    "tumbling_daily_counts",
    # --- (b) round-10 advisor-fix rows (commit 67ed3e6) ---
    "backoff_penalty_audit",
    "kmeans_cluster_purity",
    "embedding_near_dup",
    # --- (b2) registered this round, never driver-checked ---
    "utf8_ingest_quarantine",
    "streaming_zorder_ingest",
    # --- (c) the oldest driver row, honoring its round-9 cede note ---
    "partition_pruned_scan",
    # --- (d) 22 of the 33 remaining r6 rows, oldest tier ---
    "abc_pareto_classification",
    "catalog_drift",
    "cdc_apply_snapshot",
    "chunk_documents",
    "event_dedup_last_write_wins",
    "fifo_head",
    "hidden_field_projection",
    "interpolate_daily_user_value",
    "join_anti",
    "join_fk_enrichment",
    "join_semi",
    "json_source_roundtrip",
    "language_id_ngram",
    "ngram_jaccard_verify",
    "props_from_json_typed",
    "return_type_fallback",
    "session_path_trigrams",
    "sessionization",
    "setops_segments",
    "text_stats",
    "weighted_sample_allocation",
]
