"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line {"metric", "value", "unit", "queries", "sf"}.

Each query is executed once to warm the JVM/code cache, then timed.
The timed run materializes results via count() on the aggregated
output (small), so timings measure scan+shuffle+agg, not driver
collection of wide rows.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from crm_etl_pipeline_spark.registry import load_all
from crm_etl_pipeline_spark.session import get_spark

HEADLINE = [
    "flagship_segment_revenue",
    "pricing_summary",
    "topk_orders_by_revenue",
    "filtered_scan",
    "event_dedup_last_write_wins",
    "latest_order_per_customer",
    "sessionization",
    "exact_dedup_documents",
    "minhash_near_dup",
    "ann_cosine_topk",
    "typed_field_decode",
    "scd2_versioned_store",
    "asof_join_latest_order",
    "curation_pipeline",
]

# Tier 2 (new in round 6): the post-round-1 operator surface. Tier 1
# stays byte-identical so totals remain comparable across every round;
# tier 2 gives the ~70% of the registry added since its own regression
# band (the round-5 verdict's gap: a perf regression in pagerank or BM25
# was previously invisible to the bench gate). Heavier iterative
# operators run with fewer repeats (1 warm + min-of-3 vs 3 + min-of-5)
# to bound bench wall-time; min-of-N is still the noise-robust
# estimator either way.
TIER2 = [
    "copurchase_pagerank",
    "dedup_components",
    "global_rank_two_phase",
    "boilerplate_line_removal",
    "bm25_topk_search",
    "rate_limit_admission",
    "abc_pareto_classification",
    "prefix_filter_setsim_join",
    # round-9 additions (registered late round 8, kept out mid-round
    # for reading comparability): the PQ-ADC compressed-domain scan
    # (ANN family) and the two Arrow-codec multimodal stages
    "ann_pq_adc",
    "audio_energy_windows",
    "multimodal_mp4_seek_plan",
]

# Tier 3 (new in round 8): the MAINTENANCE jobs — write-inclusive
# (each run lays files down and reads them back), so their timings are
# a different regime than the read-only tiers and get their own total
# (folding compaction's multi-second write path into tier 2 would
# distort that band). 1 warm + min-of-2: the write path dominates and
# is stable; the estimator still absorbs one jitter sample.
TIER3 = [
    "scd2_compact_small_files",
    "schema_evolution_read",
    "partition_evolution_regrain",
    "scd2_expire_versions",
    # round-9 addition: rebuilds the Morton-clustered layout each run
    # (write-inclusive by construction), so it belongs with the
    # maintenance jobs, not the read-only tiers
    "zorder_range_scan",
    # round-10 addition (BENCHNOTES named it the tier-3 candidate at
    # its round-9 registration; kept out mid-round-9 for reading
    # comparability): the incremental Z-order merge — delta-touched
    # curve segments only, via dynamic partition overwrite
    "zorder_incremental_compact",
]


def _time_tier(reg, spark: object, sf_dir: str, names: list[str], warmups: int, reps: int) -> dict[str, float]:
    # warm-up: JVM JIT + parquet footer cache (one pass is not enough
    # for the codegen-heavy queries — C2 compilation of the generated
    # aggregate methods lands on the second/third execution)
    for _ in range(warmups):
        for name in names:
            reg[name].fn(spark, sf_dir).count()
    timings: dict[str, float] = {}
    for name in names:
        # min of N timed runs: the machine hosting the bench shares
        # CPU, so a single sample can be 2-3x off (observed; r3 recorded
        # +14-27% drift on untouched sub-second queries with min-of-3);
        # min is the standard noise-robust estimator for a deterministic
        # workload
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            reg[name].fn(spark, sf_dir).count()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 4)
    return timings


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)/?$", sf_dir)
    sf = float(m.group(1)) if m else None
    spark = get_spark("crm-etl-pipeline-bench")
    reg = load_all()
    tier1 = _time_tier(reg, spark, sf_dir, [n for n in HEADLINE if n in reg], 3, 5)
    tier2 = _time_tier(reg, spark, sf_dir, [n for n in TIER2 if n in reg], 1, 3)
    tier3 = _time_tier(reg, spark, sf_dir, [n for n in TIER3 if n in reg], 1, 2)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": round(sum(tier1.values()), 4),
                "unit": "sec",
                "queries": tier1,
                "tier2": tier2,
                "tier2_total": round(sum(tier2.values()), 4),
                "tier3": tier3,
                "tier3_total": round(sum(tier3.values()), 4),
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
