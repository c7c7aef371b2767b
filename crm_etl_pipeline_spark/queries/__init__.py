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
# this round. Round-12 rotation: the round-11 verdict's task 1
# executed verbatim — the ENTIRE 47-row r7+r8 stale tier rotates
# through this window (the verdict's own sizing: 22 + 25 = 47 rows,
# "exactly one round-12 window"), honoring the explicit round-12
# promises for filtered_scan, point_lookup and having_filter made at
# their round-11 defer notes.
#
# CORRECTNESS_r11 landed 50/50 green; the age distribution over the
# r1-r11 union is r11:50, r10:48, r9:39, r8:25, r7:22 — 184 queries
# ever checked, zero latest-check failures anywhere in history.
#
# This window, in verdict-ranked order:
#   (a) changed code / new registrations this round (changed code
#       outranks age, per the standing precedent):
#       - ann_recall_selfcheck: NEW (the round-11 verdict's growth
#         slot #5) — recall@3 of the served IVF 1-probe/2-probe paths
#         vs the exact brute-force baseline, computed in-query; the
#         data-independent nprobe-dominance gate is oracle-pinned TRUE
#         (the approx_distinct_selfcheck pattern), the data-dependent
#         recall floor is pytest-pinned at sf0.01;
#       - variant_props_shred: its ORACLE TEXT changed (r11 ADVICE #1
#         close) — n_absent is now COMPUTED as a path-presence count
#         in DuckDB instead of hardcoded 0, and the Spark side
#         extracts the path as 'variant' (type-agnostic presence);
#         value-identical on all current fixtures (no row carries the
#         key), planted-key parity pinned by
#         tests/test_spark4_surface.py;
#       - catalog_recursive_paths: its CODE changed (r11 ADVICE #3
#         close) — the recursion's temp view name is now unique per
#         invocation (pid + module counter, dropped after plan
#         capture) instead of a session-global constant two concurrent
#         invocations could clobber; output-identical by construction.
#       Changed code NOT in the window, each hash-unchanged-proven:
#       - the pmod_chunk_relay empty-part guard (r11 ADVICE #2 close,
#         streaming.py) is ERROR-PATH-ONLY — it raises a descriptive
#         error where a bare StopIteration would have leaked, on a
#         condition no current Spark write produces; its two consumers
#         (streaming_zorder_ingest, streaming_dim_enrichment) are
#         r11-fresh and pytest-oracle-green at HEAD with the guard in;
#       - ann_cosine_topk + ann_ivf_nprobe2 had their oracle literals
#         extracted to module constants so ann_recall_selfcheck can
#         embed the SAME text as subqueries; the rendered oracle text
#         is md5-pinned BYTE-IDENTICAL to the r10-certified form (the
#         r11 _EMB_ONE_SQL precedent: b1ba23b3... / c8c607f8..., both
#         r10 full-hash green), and both constructions ALSO run as
#         components inside ann_recall_selfcheck's in-window row.
#   (b) the 22 r7 rows — 4 driver-rounds stale, the repo's own stated
#       ceiling; every round-11 defer note promised them this window
#       (filtered_scan, point_lookup, having_filter were promised BY
#       NAME).
#   (c) 23 of the 25 r8 rows — 4 rounds stale after this round if
#       skipped. Two defer to round 13 (age 4, the documented
#       ceiling), each with an IN-WINDOW twin freshly certified this
#       round:
#       - topk_per_group (twin: topk_orders_by_revenue, the same
#         window-rank/TakeOrdered family) — displaced by
#         triangle_count, whose CODE changed mid-round (the closing
#         wedge semi-join gained a shuffle_hash hint after the sf10
#         decade run exhausted scratch disk sorting the 3.8e9-row
#         wedge stream — exact, result-identical, oracle-green at
#         HEAD, but changed code outranks age);
#       - percent_rank_acctbal (twin: ntile_order_value_quartiles,
#         the same rank-to-bucket window family) — displaced by the
#         mid-round registration bpe_merge_training (BPE vocabulary
#         training: corpus word-frequency pass + 3 unrolled merge
#         iterations at vocab grain, textbook-reference-tested, 9
#         document sweep batches green incl. the whitespace_storm
#         explicit-class find); never-driver-checked outranks
#         rotation.
#
# Age accounting if this window lands 50/50: registry 184 -> 187
# (incl. the round-12(b) registration below, which stays out of this
# window), r12:50, r11:47, r10:48, r9:39, r8:2, never-checked:1 — max
# age 4 rounds for exactly two documented defers (each twin-covered
# in-window); round 13's natural window is bigram_lm_quality_filter +
# the r9 tier + the two r8 defers.
#
# Registered AFTER this window was sized (round-12(b), the late-round
# precedent of the round-8 PQ/audio registrations): bpe_merge_training
# IS in the window above, but bigram_lm_quality_filter arrived once the
# window was already at 50 with two documented defers — it leads the
# ROUND-13 window instead. Its certification at this HEAD: full-hash
# pytest-oracle green, textbook-reference-tested, 10 document sweep
# batches green (the id_collision_docs probe found and closed its
# identity-grain contract at registration), plan lint clean, anchors
# + decade rows recorded.
#
# registry.load_all reorders REGISTRY to put these at the front; the
# rest follow in module order. Keep this list <= 50
# (test_driver_priority_window enforces the fit).
DRIVER_PRIORITY: list[str] = [
    # --- (a) changed code / new registrations this round ---
    "ann_recall_selfcheck",
    "bpe_merge_training",
    "variant_props_shred",
    "catalog_recursive_paths",
    # --- (b) the 22 r7 rows, 4 rounds stale, promised this window ---
    "ab_test_conversion",
    "approx_value_percentiles",
    "contamination_ngram_overlap",
    "cube_lineitem_flags",
    "doc_fingerprint",
    "doc_quality_score",
    "dq_audit_orders",
    "filtered_scan",
    "grouping_sets_region_segment",
    "having_filter",
    "kmv_distinct_sketch",
    "language_temperature_sample",
    "pivot_status_by_priority",
    "point_lookup",
    "props_json_extract",
    "safe_numeric_cast",
    "sample_stratified_hashrank",
    "session_window_builtin",
    "streaming_tumbling_counts",
    "system_column_enrichment",
    "train_split_stratified",
    "vocab_top_tokens",
    # --- (c) 23 of the 25 r8 rows (two defers, see above) ---
    "asof_join_latest_order",
    "bucketed_join_colocated",
    "copurchase_pagerank",
    "correlated_min_cost_supplier",
    "credential_rotation_schedule",
    "csv_source_roundtrip",
    "disjunctive_filter_scan",
    "doc_repetition_ratio",
    "exists_returned_lineitems",
    "global_rank_two_phase",
    "lag_order_gap_days",
    "latest_order_per_customer",
    "ntile_order_value_quartiles",
    "partition_evolution_regrain",
    "range_join_clicks_before_purchase",
    "running_revenue",
    "sliding_1h_user_value",
    "streaming_dlq",
    "streaming_requeue",
    "streaming_stateful_sessions",
    "tfidf_top_terms",
    "topk_orders_by_revenue",
    "zorder_range_scan",
    # --- changed-code re-certification (the shuffle_hash closing) ---
    "triangle_count",
]
