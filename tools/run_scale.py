"""Scaling-decade measurement (VERDICT r4 item 3): run the near-dedup
family and the streaming SCD2 pipeline at two scale factors a decade
apart on SELF-CONSISTENT data (tools/gen_scale.py at both ends — the
driver fixtures are never mixed into a curve) and report the per-query
scaling exponent alpha = log10(t_hi / t_lo) / log10(sf_hi / sf_lo).

alpha ≈ 1.0 is linear scaling (the design claim for every LSH/banded
operator); alpha well above ~1.2 on this decade names a superlinear
stage to fix. Fixed per-run overhead (Spark job scheduling, the
streaming pipeline's micro-batch bookkeeping) deflates alpha below 1
at these absolute sizes, so alpha < 1 reads as "overhead-dominated,
still sub-linear in data".

Timing mirrors bench.py: warm-up passes first (JIT + parquet footer
cache), then min-of-N timed runs materialized via count().

Usage: python tools/run_scale.py LO_DIR HI_DIR [out.json] [q1,q2,...]
(the optional query list restricts the run, e.g. to the document-corpus
family when the top-decade dataset has no events/customer tables)
"""

from __future__ import annotations

import json
import math
import re
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from crm_etl_pipeline_spark.registry import load_all
from crm_etl_pipeline_spark.session import get_spark

QUERIES = [
    "minhash_near_dup",
    "simhash_near_dup",
    "embedding_near_dup",
    "dedup_components",
    "streaming_scd2_state",
]

N_WARM = 2
N_TIMED = 3


def _sf(d: str) -> float:
    m = re.search(r"sf([0-9.]+)/?$", d)
    if not m:
        raise ValueError(f"cannot parse sf from {d!r}")
    return float(m.group(1))


def main(lo_dir: str, hi_dir: str, out: str | None, queries: list[str] | None = None) -> None:
    spark = get_spark("crm-etl-pipeline-scale")
    reg = load_all()
    # host-speed reference (round 12): the same three data-free probes
    # bench.py emits, so decade exponents measured on different boots
    # stay mechanically comparable (the round-12 block found per-boot
    # CPU regimes that tier totals alone cannot distinguish from code)
    from bench import _calibrate

    calib = _calibrate(spark)
    print(f"calib: {calib}", file=sys.stderr)
    global QUERIES
    if queries:
        QUERIES = queries
    results: dict[str, dict] = {}
    bucket_stats: dict[str, dict] = {}
    for d in (lo_dir, hi_dir):
        for _ in range(N_WARM):
            for name in QUERIES:
                reg[name].fn(spark, d).count()
        for name in QUERIES:
            best = float("inf")
            for _ in range(N_TIMED):
                t0 = time.perf_counter()
                n_rows = reg[name].fn(spark, d).count()
                best = min(best, time.perf_counter() - t0)
            results.setdefault(name, {})[d] = {"sec": round(best, 3), "rows": n_rows}
            print(f"{d} {name}: {best:.3f}s rows={n_rows}", file=sys.stderr)
        # hot-bucket telemetry at each end: the LSH caps are a no-op
        # unless max_bucket approaches BUCKET_CAP. Only meaningful when
        # the run's dataset includes a document corpus (the CRM-family
        # runs generate events/customer/orders only).
        if Path(f"{d}/documents.parquet").exists():
            prof = reg["lsh_bucket_profile"].fn(spark, d).collect()
            bucket_stats[d] = {
                "max_bucket": max(r.max_bucket for r in prof),
                "n_over_cap": sum(r.n_over_cap for r in prof),
            }
    decade = math.log10(_sf(hi_dir) / _sf(lo_dir))
    report = {
        "lo": {"dir": lo_dir, "sf": _sf(lo_dir)},
        "hi": {"dir": hi_dir, "sf": _sf(hi_dir)},
        "queries": {},
        "buckets": bucket_stats,
        "calib": calib,
    }
    for name, ends in results.items():
        t_lo, t_hi = ends[lo_dir]["sec"], ends[hi_dir]["sec"]
        report["queries"][name] = {
            "t_lo_sec": t_lo,
            "t_hi_sec": t_hi,
            "rows_lo": ends[lo_dir]["rows"],
            "rows_hi": ends[hi_dir]["rows"],
            "alpha": round(math.log10(t_hi / t_lo) / decade, 3),
        }
    line = json.dumps(report)
    print(line)
    if out:
        Path(out).write_text(line + "\n")
    spark.stop()


if __name__ == "__main__":
    main(
        sys.argv[1],
        sys.argv[2],
        sys.argv[3] if len(sys.argv) > 3 else None,
        sys.argv[4].split(",") if len(sys.argv) > 4 else None,
    )
