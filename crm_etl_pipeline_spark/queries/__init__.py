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
# this round. Round-14 rotation, executing the round-13 verdict's
# ranked task 1 (with the round-14 changed-bytes rows folded in):
#
# CORRECTNESS_r13 landed 50/50 green; the age distribution over the
# r1-r13 union is r13:50, r12:48, r11:45, r10:48 — 191 queries ever
# checked, zero latest-check failures, every registered query checked
# at least once. This round registers 6 new queries (197 total) and
# the candidate set is 66 for 50 slots; the two-defer precedent
# extends to SIXTEEN defers, named below and promised for round 15.
#
# This window, in verdict-ranked order:
#   (a) NEVER-CHECKED (new round-14 registrations):
#       - hybrid_rank_fusion: RRF fusion of the BM25 arm and a dense
#         exact-inner-product arm (retrieval growth) — full oracle,
#         20 sweep batches green, lexical arm pinned to
#         bm25_topk_search positionally;
#       - dsir_importance_resample: DSIR hashed-ngram importance
#         weights + deterministic systematic resample (training-prep
#         growth) — full oracle, 12 sweep batches green, the
#         two-phase-vs-naive cumulation equivalence proven by hash;
#       - dedup_cluster_keep_best: canonical keep-longest selection
#         per resolved near-dup component (composes dedup_components
#         as a subplan; _COMPONENTS_CTES md5-pinned byte-identical);
#       - chunk_bm25_retrieval: RAG passage retrieval — BM25 at CHUNK
#         grain over the certified chunker (composes chunk_documents;
#         _CHUNKS_SQL md5-pinned byte-identical), 13 sweep batches;
#       - semantic_dedup: SemDeDup over k-means cells (verdict growth
#         slot #5) — parameterized _kmeans_core_sql/_kmeans_assign,
#         full oracle, 10 embedding sweep batches green;
#       - ann_ivf_incremental_index: streamed arrivals assigned to a
#         frozen bootstrap codebook, append-only cell partitions
#         (verdict growth slot #6) — batch-parity + append-only proven
#         in tests/test_streaming.py, 10 sweep batches green.
#   (b) CHANGED BYTES this round (changed code outranks age):
#       - ann_recall_selfcheck (r12), ann_ivf_probe, ann_ivf_nprobe2,
#         ann_ivf_persisted_index (r10): the _ASSIGN_SQL row-grain
#         collision fix — the new incremental query EXPOSED a latent
#         cross-engine split (DuckDB argmin-of-summed-residuals vs
#         Spark per-row argmin under id_collision_embs: 9/16 collided
#         ids flipped cells); the whole IVF family's oracle text moved
#         together and re-swept green (see _ASSIGN_SQL's comment);
#       - embedding_kmeans, kmeans_cluster_purity (r10): Spark loop
#         extracted into _kmeans_assign and the oracle CTE chain into
#         _kmeans_core_sql for semantic_dedup — rendering byte-identical
#         (md5-pinned in tests/test_llmops.py), plus the round-13
#         campaign's NULLS FIRST seed windows, still un-driver-checked;
#       - streaming_incremental_dedup (r13): the round-13 ADVICE close
#         spelled doc_id NULLS LAST in its oracle's ranked window, and
#         pmod_chunk_relay's key override went null-safe;
#       - ann_pq_adc, weighted_sample_allocation, fifo_head (r10) and
#         sample_stratified_hashrank, lag_order_gap_days (r12): the
#         round-13 hazard campaign's changed bytes (seed windows,
#         hash-rank spellings, tiebreaks) that never got a driver row
#         on the new bytes — the round-13 verdict's #1 ask;
#       - the scd2 family x8 (r11): _STORE_SQL's placement spelling
#         changed the ORACLE TEXT of scd2_versioned_store,
#         scd2_current_view, scd2_asof_snapshot, scd2_expire_versions,
#         scd2_store_roundtrip, scd2_soft_delete,
#         scd2_compact_small_files, streaming_scd2_state — all
#         full-hash pytest-green at HEAD, const_ts/null_event_ids/
#         dup_events batch-certified, now driver-checked on the bytes.
#   (c) 24 of the 40 unchanged r10 rows (age 4 this round — at the
#       ceiling): every multimodal decode path, the gateway family,
#       the serving ANN/embedding scans, sources and sessionization.
#   (d) SIXTEEN defers to round 15, promised by name (unchanged
#       bytes, pure-Catalyst or manifest-grain shapes with the
#       strongest sweep coverage and pytest-oracle re-verification
#       every round): join_anti, join_semi, setops_segments,
#       hidden_field_projection, return_type_fallback,
#       props_from_json_typed, partition_pruned_scan,
#       abc_pareto_classification, multimodal_manifest,
#       multimodal_mp4_seek_plan, multimodal_frame_sample,
#       interpolate_daily_user_value (r10), plus text_stats,
#       chunk_documents, knn_label_disagreement and
#       embedding_standardize (r10 — displaced mid-round by the four
#       extra never-checked registrations, which outrank age; each
#       sits in 9+ sweep batches). Round 15's window is these 16 +
#       whatever round 14 changes — under budget.
#
# Age accounting if this window lands 50/50: registry 197; r14:50,
# r13:49, r12:45, r11:37, r10:16 (the named defers, age 5 when round
# 15 checks them first) — every other query age <= 3, zero
# never-checked.
#
# registry.load_all reorders REGISTRY to put these at the front; the
# rest follow in module order. Keep this list <= 50
# (test_driver_priority_window enforces the fit).
DRIVER_PRIORITY: list[str] = [
    # --- (a) never-checked new registrations ---
    # (mid-round additions: the hybrid retrieval fusion, the DSIR
    # importance resample, the keep-best cluster selection and the
    # chunk-grain BM25 retrieval registered after the window was first
    # cut; never-checked outranks age, so they displace the four (c)
    # rows with the densest sweep coverage — text_stats,
    # chunk_documents, knn_label_disagreement, embedding_standardize —
    # which join the named round-15 defers, now SIXTEEN)
    "hybrid_rank_fusion",
    "dsir_importance_resample",
    "dedup_cluster_keep_best",
    "chunk_bm25_retrieval",
    "semantic_dedup",
    "ann_ivf_incremental_index",
    # --- (b) changed-bytes rows ---
    "ann_recall_selfcheck",
    "ann_ivf_probe",
    "ann_ivf_nprobe2",
    "ann_ivf_persisted_index",
    "embedding_kmeans",
    "kmeans_cluster_purity",
    "streaming_incremental_dedup",
    "ann_pq_adc",
    "weighted_sample_allocation",
    "fifo_head",
    "sample_stratified_hashrank",
    "lag_order_gap_days",
    "scd2_versioned_store",
    "scd2_current_view",
    "scd2_asof_snapshot",
    "scd2_expire_versions",
    "scd2_store_roundtrip",
    "scd2_soft_delete",
    "scd2_compact_small_files",
    "streaming_scd2_state",
    # --- (c) the 24 windowed r10 age rows ---
    "ann_cosine_topk",
    "ann_lsh_bucketed",
    "audio_energy_windows",
    "backoff_penalty_audit",
    "catalog_drift",
    "cdc_apply_snapshot",
    "embedding_centroid_per_label",
    "embedding_near_dup",
    "embedding_norm_topk",
    "embedding_quantize_int8",
    "event_dedup_last_write_wins",
    "join_fk_enrichment",
    "json_source_roundtrip",
    "language_id_ngram",
    "multimodal_decode_quarantine",
    "multimodal_features",
    "multimodal_real_decode",
    "rate_limit_admission",
    "salted_user_event_totals",
    "session_path_trigrams",
    "sessionization",
    "streaming_rate_limit",
    "tumbling_daily_counts",
    "utf8_ingest_quarantine",
]
