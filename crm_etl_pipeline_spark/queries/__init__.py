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
# this round. Round-11 rotation: the round-10 verdict's tasks 1-2
# executed verbatim, plus this round's own new registrations.
# CORRECTNESS_r10 landed 50/50 green; the age distribution over the
# r1-r10 union is r10:50, r9:47, r8:33, r7:37, r6:12 — 179 queries
# ever checked, zero latest-check failures anywhere in history.
#
# This window, in verdict-ranked order:
#   (a) the 21-row round-10 changed-code ledger (changed code outranks
#       age; every row was pytest-proven hash-unchanged on clean
#       fixtures at the round-10 HEAD when deferred, per the c2
#       precedent — full rationale in the round-10 preamble, preserved
#       in git history at 7b6bf72):
#       - zorder_incremental_compact (the round-10 grain-knob
#         parameterization 9f02760, whose streaming twin WAS
#         r10-certified under the shared code; ALSO touched this round
#         by the advisor pmod-sharding fix, 77fe56f);
#       - the 10 docs-winner rows under the identity-collision
#         contract (llmops._one_per_doc / _DOCS_ONE_SQL):
#         minhash_near_dup, lsh_bucket_profile, simhash_near_dup,
#         dedup_components, repeated_span_mining,
#         prefix_filter_setsim_join, boilerplate_line_removal,
#         curation_pipeline, pack_training_sequences — plus
#         ngram_jaccard_verify, which the r10 window ALREADY certified
#         under the winner code (it was in both the ledger and the r10
#         rotation); it re-runs here so the ledger closes as one
#         block;
#       - flagship_segment_revenue (customer-dim MIN-segment winner;
#         its last full-hash row was r7 — it runs every round as the
#         entry() smoke but not full-hash) + the 8 _STORE_SQL /
#         scd.scd2_apply MIN-collapse consumers: scd2_versioned_store,
#         scd2_current_view, scd2_soft_delete, scd2_store_roundtrip,
#         scd2_asof_snapshot, scd2_expire_versions,
#         scd2_compact_small_files, streaming_scd2_state;
#       - streaming_zorder_ingest (r10-certified, but this round's
#         advisor fix changed its arrival-sharding harness —
#         pmod(coalesce(event_id,0),4) replaces the NULL/negative-
#         dropping `%` — so it re-certifies under the new code;
#         hash-unchanged on clean fixtures where ids are non-negative,
#         pytest-oracle-green at HEAD).
#       NOT in the ledger despite the round-11 advisor edit:
#       embedding_kmeans and ann_pq_adc — the _EMB_ONE_SQL
#       interpolation renders their oracle text BYTE-IDENTICAL to the
#       r10-certified form (md5-pinned during the edit), and both were
#       full-hash green in r10.
#   (b) the five round-11 registrations (never driver-checked =
#       highest priority after changed code):
#       - skew_salted_join: the round-10 verdict's growth slot #5 —
#         the salted hot-key fact⋈dim JOIN (explode-replicated dim ×
#         pmod-salted fact, sort-merge hinted so the salted exchange
#         is the real plan), oracle = the PLAIN unsalted join, proving
#         the salt is a pure re-partitioning; dim side goes through
#         the flagship's identity-collision MIN-segment winner;
#       - xml_source_roundtrip: the verdict's stretch #6, retargeted
#         from Avro to XML because the spark-avro DATASOURCE jar is
#         not in this Spark build (avro-1.12.1 core jars are, but the
#         external org.apache.spark:spark-avro module is absent and
#         the environment is offline) while XML is BUILT IN to Spark
#         4 — same row-grain certification pattern as orc/json/csv,
#         plus the XML-1.0 character boundary as a validate-or-
#         quarantine gate (control characters have NO xml escape; the
#         control_char_props sweep batch certifies the gate and the
#         other three formats' verbatim carry);
#       - variant_props_shred: Spark-4 VARIANT (try_parse_json /
#         variant_get / schema_of_variant) as the third rung of the
#         props ladder — schema-on-read with NO declared schema, with
#         the planted-malformed quarantine posture of
#         utf8_ingest_quarantine;
#       - catalog_recursive_paths: Spark-4 WITH RECURSIVE walking the
#         org→space→app→field tree as one uniform edge list to any
#         depth (UnionLoop execution), vs catalog_tree's fixed
#         per-level joins;
#       - streaming_dim_enrichment: the remaining Structured Streaming
#         join shape — a stateless stream-static LEFT join to the
#         customer dim across 4 genuine micro-batches (re-planned per
#         trigger, UNKNOWN posture for dim-less events, flagship's
#         MIN-segment identity winner on the dim side).
#       Registering these three displaced three (d) slots, each
#       deferring to round 12 with named fresher twins (all
#       pytest-oracle-green at HEAD): filtered_scan (twins:
#       partition_pruned_scan r10 — the same S1/F1 pushdown at layout
#       level — and disjunctive_filter_scan r8), point_lookup (twin:
#       keyset_pagination_orders r9, the same seek-predicate serving
#       path), and having_filter (twins: pricing_summary and
#       rollup_revenue, BOTH still in this window — the same
#       scan→agg→filter family).
#   (c) the 12 r6 rows, 4 rounds driver-stale — the verdict's task 2,
#       rotated oldest-first exactly as promised by their round-10
#       defer notes: catalog_fields_tree, composite_key_roundtrip,
#       decile_gains_table, event_type_routing, histogram_order_values,
#       join_full_outer, join_left_missing, kmv_sketch_merge,
#       mom_revenue_growth, orc_source_roundtrip,
#       pearson_correlation_matrix, triangle_count.
#   (d) 12 of the 34 remaining r7 rows (the oldest tier after (c)),
#       chosen to keep every operator family with at least one
#       in-window-or-r9+ fresh representative. The 22 r7 rows deferred
#       to round 12 — the 19 below plus filtered_scan, point_lookup and
#       having_filter (displaced by the (b) registrations, twins named
#       there) —
#       each with a named fresher twin exercising the same machinery
#       meanwhile (all pytest-oracle-green at HEAD via
#       tests/test_oracle.py):
#       ab_test_conversion (chi_square_segment_nation +
#       funnel_conversion r9), approx_value_percentiles
#       (value_percentiles in-window — the exact/approx pair — +
#       approx_distinct_selfcheck r9), contamination_ngram_overlap
#       (ngram_jaccard_verify in-window, same n-gram machinery),
#       cube_lineitem_flags + grouping_sets_region_segment
#       (rollup_revenue in-window — same Expand multi-grouping
#       machinery), pivot_status_by_priority (rollup_revenue in-window
#       + event_transition_matrix r9, same pivot shape),
#       doc_fingerprint (text_stats r10 + token_profile r9),
#       doc_quality_score (language_id_ngram + chunk_documents r10),
#       dq_audit_orders (benford_price_audit + shipping_delay_audit
#       r9, same audit family), kmv_distinct_sketch (kmv_sketch_merge
#       in-window + kmv_set_intersection r9), language_temperature_
#       sample + sample_stratified_hashrank + train_split_stratified
#       (weighted_sample_allocation r10 + pps_systematic_sample r9,
#       same hash-rank sampling machinery), props_json_extract
#       (props_from_json_typed r10, same extractor), safe_numeric_cast
#       (return_type_fallback r10 + money_decimal_cast in-window, same
#       cast family), session_window_builtin (sessionization r10,
#       exact twin), streaming_tumbling_counts (tumbling_daily_counts
#       r10, exact twin), system_column_enrichment (typed_field_decode
#       + date_parse_reformat in-window, same transforms module),
#       vocab_top_tokens (token_profile r9 + bm25_topk_search r9).
#
# Age accounting if this window lands 50/50: r11:50 (incl. the five
# new registrations, registry 179 -> 184), r10:48, r9:39, r8:25,
# r7:22 — max age 4 rounds only for the 22 documented defers above
# (each twin-covered), the same steady-state ceiling round 10 ran at.
# The r7/r8 tiers are round 12's natural window (22 + 25 = 47 rows).
#
# registry.load_all reorders REGISTRY to put these at the front; the
# rest follow in module order. Keep this list <= 50
# (test_driver_priority_window enforces the fit).
DRIVER_PRIORITY: list[str] = [
    # --- (a) the 21-row round-10 changed-code ledger ---
    "zorder_incremental_compact",
    "minhash_near_dup",
    "lsh_bucket_profile",
    "simhash_near_dup",
    "dedup_components",
    "repeated_span_mining",
    "prefix_filter_setsim_join",
    "boilerplate_line_removal",
    "curation_pipeline",
    "pack_training_sequences",
    "ngram_jaccard_verify",
    "flagship_segment_revenue",
    "scd2_versioned_store",
    "scd2_current_view",
    "scd2_soft_delete",
    "scd2_store_roundtrip",
    "scd2_asof_snapshot",
    "scd2_expire_versions",
    "scd2_compact_small_files",
    "streaming_scd2_state",
    "streaming_zorder_ingest",
    # --- (b) registered this round, never driver-checked ---
    "skew_salted_join",
    "xml_source_roundtrip",
    "variant_props_shred",
    "catalog_recursive_paths",
    "streaming_dim_enrichment",
    # --- (c) the 12 r6 rows, honoring their round-10 defer notes ---
    "catalog_fields_tree",
    "composite_key_roundtrip",
    "decile_gains_table",
    "event_type_routing",
    "histogram_order_values",
    "join_full_outer",
    "join_left_missing",
    "kmv_sketch_merge",
    "mom_revenue_growth",
    "orc_source_roundtrip",
    "pearson_correlation_matrix",
    "triangle_count",
    # --- (d) 12 of the 34 r7 rows, oldest tier, family-balanced ---
    "array_csv_roundtrip",
    "date_parse_reformat",
    "html_strip_normalize",
    "money_decimal_cast",
    "pricing_summary",
    "retry_and_dead_letter",
    "rollup_revenue",
    "schema_evolution_read",
    "typed_field_decode",
    "value_percentiles",
    "version_counts_per_key",
    "wap_publish_roundtrip",
]
