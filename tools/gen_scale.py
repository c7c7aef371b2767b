"""Generate self-consistent synthetic tables at arbitrary scale factors
for the SCALE.md scaling-decade measurement (VERDICT r4 item 3).

The driver's /root/testdata is read-only and stops at sf0.1, so the
decade measurement needs locally generated data. To keep the exponent
meaningful, BOTH ends of each decade come from THIS generator (same
distributions, same near-dup planting rate) — the driver's tables are
never mixed into the curve. Distributions mirror the driver fixtures
(inspected at sf0.1): documents ≈ 50k docs/sf from a ~40-word vocab,
~5% planted near-dups + 0.2% exact dups; embeddings ≈ 20k × 64-dim
float32 in 10 label clusters; events ≈ 1M rows/sf over 15k users/sf,
TIMESTAMP(MICROS) on disk exactly like the driver's events.parquet;
customer ≈ 150k rows/sf.

Usage: python tools/gen_scale.py SF OUTDIR   (e.g. 1 /tmp/scale/sf1)
"""

from __future__ import annotations

import json
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = (
    "batch part spark line column order small sort fast value scan hash slow "
    "vector query agg table key group the filter customer stream join shuffle "
    "plan stage task node broadcast window merge index cache disk memory row "
    "file block codec a"
).split()

LANGS = ["en", "en", "en", "zh", "de", "fr", "es"]  # en-heavy like the fixture


def spaced_ids(n: int) -> np.ndarray:
    """Ids that can never collide with the fabricated +100000 clone
    offset used by the dedup queries (llmops.DUP_OFFSET and the
    embedding clone offset): skip every other 100k block, so real ids
    occupy [0,100k) ∪ [200k,300k) ∪ … and the +100000 clones land in
    the gaps. Without this, any sf with >100k rows conflates a clone's
    id with a genuine document's (observed at sf10: hybrid minhash
    signatures from groupBy on the shared id)."""
    idx = np.arange(n)
    return idx + (idx // 100_000) * 100_000


def gen_documents(rng: np.random.Generator, n: int) -> pa.Table:
    lengths = np.clip(rng.lognormal(3.7, 0.6, n), 8, 400).astype(int)
    texts: list[str] = []
    for i in range(n):
        r = rng.random()
        if i > 10 and r < 0.002:  # exact duplicate of an earlier doc
            texts.append(texts[rng.integers(0, i)])
            continue
        if i > 10 and r < 0.05:  # near duplicate: perturb ~5% of words
            words = texts[rng.integers(0, i)].split()
            for j in rng.integers(0, len(words), max(1, len(words) // 20)):
                words[j] = VOCAB[rng.integers(0, len(VOCAB))]
            texts.append(" ".join(words))
            continue
        idx = rng.integers(0, len(VOCAB), lengths[i])
        texts.append(" ".join(VOCAB[k] for k in idx))
    return pa.table(
        {
            "doc_id": pa.array(spaced_ids(n), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array([LANGS[k] for k in rng.integers(0, len(LANGS), n)]),
            "source": pa.array([f"src{k}" for k in rng.integers(0, 20, n)]),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )


def gen_embeddings(rng: np.random.Generator, n: int) -> pa.Table:
    centroids = rng.normal(0, 1, (10, 64))
    labels = rng.integers(0, 10, n)
    vecs = (centroids[labels] + rng.normal(0, 0.35, (n, 64))).astype(np.float32)
    return pa.table(
        {
            "vec_id": pa.array(spaced_ids(n), pa.int64()),
            "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
            "label": pa.array(labels, pa.int32()),
        }
    )


def gen_events(rng: np.random.Generator, n: int, n_users: int) -> pa.Table:
    t0 = np.datetime64("2024-01-01T00:00:00", "ns").astype(np.int64)
    span = 30 * 24 * 3600 * 10**9
    ts = t0 + rng.integers(0, span, n)
    # round-5 driver fixtures store TIMESTAMP(MICROS); match that vintage
    # (io.normalize_event_ts handles the older nanos layout too)
    ts_us = np.sort(ts) // 1000
    types = np.array(["signup", "click", "purchase", "error", "view"])
    return pa.table(
        {
            "event_id": pa.array(np.arange(n), pa.int64()),
            "ts": pa.array(ts_us).cast(pa.timestamp("us")),
            "user_id": pa.array(rng.integers(0, n_users, n), pa.int64()),
            "event_type": pa.array(types[rng.integers(0, 5, n)]),
            "value": pa.array(np.round(rng.uniform(0, 560, n), 2), pa.float64()),
            "props": pa.array([json.dumps({"k": int(k)}) for k in rng.integers(0, 100, n)]),
        }
    )


def write_events_chunked(
    rng: np.random.Generator, n: int, n_users: int, path: str, chunk: int = 5_000_000
) -> int:
    """Stream the events table to ``path`` one row-group at a time —
    the round-5 blocker for the sf100 streaming decade was THIS table
    (a 100 M-row build of gen_events materializes ~8 GB of Python
    json strings at once). Only the int64 timestamp array is ever
    whole-table resident (800 MB at sf100 — needed because the fixture
    contract is a GLOBALLY sorted ts column, and per-chunk sorting
    would leave batch boundaries unordered); every other column,
    including the Python-string props, is generated and released per
    chunk. Matches gen_events in DISTRIBUTIONS only, not exact seeded
    values: the chunked builder interleaves RNG draws per chunk
    (user/type/value/props) while gen_events draws whole-column, so the
    same sf+seed yields different row values depending on which side of
    the chunking threshold a table lands — fine for scaling curves,
    which compare shapes, never rows across the threshold."""
    t0 = np.datetime64("2024-01-01T00:00:00", "ns").astype(np.int64)
    span = 30 * 24 * 3600 * 10**9
    ts_us = np.sort(t0 + rng.integers(0, span, n)) // 1000
    types = np.array(["signup", "click", "purchase", "error", "view"])
    writer: pq.ParquetWriter | None = None
    try:
        for start in range(0, n, chunk):
            end = min(start + chunk, n)
            m = end - start
            tbl = pa.table(
                {
                    "event_id": pa.array(np.arange(start, end), pa.int64()),
                    "ts": pa.array(ts_us[start:end]).cast(pa.timestamp("us")),
                    "user_id": pa.array(rng.integers(0, n_users, m), pa.int64()),
                    "event_type": pa.array(types[rng.integers(0, 5, m)]),
                    "value": pa.array(np.round(rng.uniform(0, 560, m), 2), pa.float64()),
                    "props": pa.array(
                        [json.dumps({"k": int(k)}) for k in rng.integers(0, 100, m)]
                    ),
                }
            )
            if writer is None:
                writer = pq.ParquetWriter(path, tbl.schema)
            writer.write_table(tbl)
            print(f"events: chunk rows [{start}, {end}) -> {path}")
    finally:
        if writer is not None:
            writer.close()
    return n


def write_customer_chunked(
    rng: np.random.Generator, n: int, path: str, chunk: int = 5_000_000
) -> int:
    """Chunked twin of gen_customer for the top decade (15 M c_name
    Python strings would otherwise peak at a few GB)."""
    segs = np.array(["BUILDING", "AUTOMOBILE", "MACHINERY", "HOUSEHOLD", "FURNITURE"])
    writer: pq.ParquetWriter | None = None
    try:
        for start in range(0, n, chunk):
            end = min(start + chunk, n)
            m = end - start
            tbl = pa.table(
                {
                    "c_custkey": pa.array(np.arange(start + 1, end + 1), pa.int64()),
                    "c_name": pa.array([f"Customer#{i:09d}" for i in range(start + 1, end + 1)]),
                    "c_nationkey": pa.array(rng.integers(0, 25, m), pa.int32()),
                    "c_acctbal": pa.array(np.round(rng.uniform(-999, 9999, m), 2), pa.float64()),
                    "c_mktsegment": pa.array(segs[rng.integers(0, 5, m)]),
                }
            )
            if writer is None:
                writer = pq.ParquetWriter(path, tbl.schema)
            writer.write_table(tbl)
    finally:
        if writer is not None:
            writer.close()
    return n


def gen_orders(rng: np.random.Generator, n: int, n_cust: int) -> pa.Table:
    """Orders shaped like the driver fixture (10 orders/customer, dates
    spanning 1995-2001) so the CRM-analytics family (cohort/RFM) can be
    measured on self-consistent data at any sf."""
    t0 = np.datetime64("1995-01-01T00:00:00", "us").astype(np.int64)
    span = int(6.5 * 365.25 * 24 * 3600) * 10**6
    status = np.array(["O", "F", "P"])
    prio = np.array(["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"])
    return pa.table(
        {
            "o_orderkey": pa.array(np.arange(1, n + 1), pa.int64()),
            "o_custkey": pa.array(rng.integers(1, n_cust + 1, n), pa.int64()),
            "o_orderstatus": pa.array(status[rng.integers(0, 3, n)]),
            "o_totalprice": pa.array(np.round(rng.uniform(900, 500_000, n), 2), pa.float64()),
            "o_orderdate": pa.array(t0 + rng.integers(0, span, n)).cast(pa.timestamp("us")),
            "o_orderpriority": pa.array(prio[rng.integers(0, 5, n)]),
        }
    )


def gen_lineitem(rng: np.random.Generator, n_orders: int) -> pa.Table:
    """~4 lines/order over a part catalog sized like the fixture ratio
    (part count = orders/7.5), so basket sizes stay bounded and the
    co-purchase pair join has fixture-like fanout at any sf."""
    lines_per = rng.integers(1, 8, n_orders)
    orderkeys = np.repeat(np.arange(1, n_orders + 1), lines_per)
    n = len(orderkeys)
    n_parts = max(200, n_orders // 8)
    t0 = np.datetime64("1995-01-01T00:00:00", "us").astype(np.int64)
    span = int(6.5 * 365.25 * 24 * 3600) * 10**6
    flags = np.array(["N", "R", "A"])
    status = np.array(["O", "F"])
    return pa.table(
        {
            "l_orderkey": pa.array(orderkeys, pa.int64()),
            "l_partkey": pa.array(rng.integers(1, n_parts + 1, n), pa.int64()),
            "l_suppkey": pa.array(rng.integers(1, 1000, n), pa.int64()),
            "l_linenumber": pa.array(
                np.concatenate([np.arange(1, c + 1) for c in lines_per]), pa.int32()
            ),
            "l_quantity": pa.array(rng.integers(1, 50, n).astype(np.float64)),
            "l_extendedprice": pa.array(np.round(rng.uniform(900, 100_000, n), 2)),
            "l_discount": pa.array(np.round(rng.uniform(0, 0.1, n), 2)),
            "l_tax": pa.array(np.round(rng.uniform(0, 0.08, n), 2)),
            "l_returnflag": pa.array(flags[rng.integers(0, 3, n)]),
            "l_linestatus": pa.array(status[rng.integers(0, 2, n)]),
            "l_shipdate": pa.array(t0 + rng.integers(0, span, n)).cast(pa.timestamp("us")),
        }
    )


def gen_customer(rng: np.random.Generator, n: int) -> pa.Table:
    segs = np.array(["BUILDING", "AUTOMOBILE", "MACHINERY", "HOUSEHOLD", "FURNITURE"])
    return pa.table(
        {
            "c_custkey": pa.array(np.arange(1, n + 1), pa.int64()),
            "c_name": pa.array([f"Customer#{i:09d}" for i in range(1, n + 1)]),
            "c_nationkey": pa.array(rng.integers(0, 25, n), pa.int32()),
            "c_acctbal": pa.array(np.round(rng.uniform(-999, 9999, n), 2), pa.float64()),
            "c_mktsegment": pa.array(segs[rng.integers(0, 5, n)]),
        }
    )


def main(sf: float, outdir: str, only: set[str] | None = None) -> None:
    import os

    os.makedirs(outdir, exist_ok=True)
    rng = np.random.default_rng(42)  # same seed at every sf: sf1 ⊇-like sf0.1
    builders = {
        "documents": lambda: gen_documents(rng, int(50_000 * sf)),
        "embeddings": lambda: gen_embeddings(rng, int(20_000 * sf)),
        "events": lambda: gen_events(rng, int(1_000_000 * sf), int(15_000 * sf)),
        "customer": lambda: gen_customer(rng, int(150_000 * sf)),
        "orders": lambda: gen_orders(rng, int(1_500_000 * sf), int(150_000 * sf)),
        "lineitem": lambda: gen_lineitem(rng, int(1_500_000 * sf)),
    }
    # Chunked writers kick in past 20 M rows (events) / 5 M (customer):
    # the monolithic builders materialize per-row Python strings, which
    # at sf100 would peak at ~8 GB for events.props alone. `only`
    # restricts a run to the tables its query family reads.
    chunked = {
        "events": lambda path: write_events_chunked(
            rng, int(1_000_000 * sf), int(15_000 * sf), path
        ),
        "customer": lambda path: write_customer_chunked(rng, int(150_000 * sf), path),
    }
    thresholds = {"events": 20_000_000, "customer": 5_000_000}
    for name, build in builders.items():
        if only and name not in only:
            continue
        path = f"{outdir}/{name}.parquet"
        n_target = int({"events": 1_000_000, "customer": 150_000}.get(name, 0) * sf)
        if name in chunked and n_target > thresholds[name]:
            n = chunked[name](path)
            print(f"{name}: {n} rows (chunked) -> {path}")
            continue
        tbl = build()
        pq.write_table(tbl, f"{outdir}/{name}.parquet", store_schema=True)
        print(f"{name}: {tbl.num_rows} rows -> {outdir}/{name}.parquet")


if __name__ == "__main__":
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    main(float(sys.argv[1]), sys.argv[2], only)
