"""Targeted semantics for the CRM analytics pack (queries/crm_q.py) on
planted micro-fixtures — the properties the sf0.01 oracle equivalence
cannot isolate on its own: strict funnel stage ordering, LOCF fill
values, and that record-linkage blocking really prunes cross-block
candidates."""

from __future__ import annotations

import os
from datetime import datetime

import pyarrow as pa
import pyarrow.parquet as pq

from crm_etl_pipeline_spark.registry import load_all

REGISTRY = load_all()


def _write_events(tmp_path, rows) -> str:
    """rows: list of (event_id, iso_ts, user_id, event_type, value)."""
    out = str(tmp_path / "planted")
    os.makedirs(out, exist_ok=True)
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array(
                [datetime.fromisoformat(r[1]) for r in rows], pa.timestamp("us")
            ),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows]),
            "value": pa.array([float(r[4]) for r in rows], pa.float64()),
            "props": pa.array(["{}"] * len(rows)),
        }
    )
    pq.write_table(tbl, f"{out}/events.parquet")
    return out


def test_funnel_is_strictly_ordered(spark, tmp_path):
    """User 1 converts in order; user 2's only purchase PRECEDES their
    first click, so they reach 'click' but not 'purchase'; user 3 never
    signed up, so no stage counts them (first-touch chaining starts at
    stage 1)."""
    rows = [
        (1, "2024-01-01T00:00:00", 1, "signup", 1),
        (2, "2024-01-01T01:00:00", 1, "view", 1),
        (3, "2024-01-01T02:00:00", 1, "click", 1),
        (4, "2024-01-01T03:00:00", 1, "purchase", 1),
        (5, "2024-01-02T00:00:00", 2, "signup", 1),
        (6, "2024-01-02T01:00:00", 2, "view", 1),
        (7, "2024-01-02T02:00:00", 2, "purchase", 1),  # before first click
        (8, "2024-01-02T03:00:00", 2, "click", 1),
        (9, "2024-01-03T00:00:00", 3, "view", 1),
        (10, "2024-01-03T01:00:00", 3, "click", 1),
        (11, "2024-01-03T02:00:00", 3, "purchase", 1),
    ]
    planted = _write_events(tmp_path, rows)
    got = {
        r.stage_name: (r.users_reached, r.conv_from_first)
        for r in REGISTRY["funnel_conversion"].fn(spark, planted).collect()
    }
    assert got == {
        "signup": (2, 1.0),
        "view": (2, 1.0),
        "click": (2, 1.0),
        "purchase": (1, 0.5),
    }


def test_funnel_same_timestamp_counts(spark, tmp_path):
    """ts >= t_prev is inclusive: a purchase at the exact instant of the
    first click still converts (the reference's webhook events can share
    a timestamp within one batch)."""
    rows = [
        (1, "2024-01-01T00:00:00", 1, "signup", 1),
        (2, "2024-01-01T00:00:00", 1, "view", 1),
        (3, "2024-01-01T00:00:00", 1, "click", 1),
        (4, "2024-01-01T00:00:00", 1, "purchase", 1),
    ]
    planted = _write_events(tmp_path, rows)
    got = {
        r.stage_name: r.users_reached
        for r in REGISTRY["funnel_conversion"].fn(spark, planted).collect()
    }
    assert got == {"signup": 1, "view": 1, "click": 1, "purchase": 1}


def test_gapfill_zero_fill_and_locf(spark, tmp_path):
    """Purchases on day 1 (10.0) and day 4 (20.0): days 2-3 appear with
    revenue 0 and LOCF 10.0; non-purchase events never contribute."""
    rows = [
        (1, "2024-01-01T09:00:00", 7, "purchase", 10.0),
        (2, "2024-01-02T09:00:00", 7, "click", 99.0),  # ignored
        (3, "2024-01-04T09:00:00", 7, "purchase", 20.0),
    ]
    planted = _write_events(tmp_path, rows)
    got = {
        str(r.day): (r.revenue, r.had_purchase, r.revenue_locf)
        for r in REGISTRY["gapfill_daily_user_revenue"].fn(spark, planted).collect()
    }
    assert got == {
        "2024-01-01": (10.0, True, 10.0),
        "2024-01-02": (0.0, False, 10.0),
        "2024-01-03": (0.0, False, 10.0),
        "2024-01-04": (20.0, True, 20.0),
    }


def test_linkage_blocking_prunes_cross_block_pairs(spark, tmp_path):
    """Two customers with IDENTICAL names in different nations never
    become a candidate pair (the blocking key includes nationkey), while
    the planted dirty re-entry links back to its source at distance 1."""
    out = str(tmp_path / "planted")
    os.makedirs(out, exist_ok=True)
    # custkey 2 hashes into the dirty 25% (md5('2') starts with 'c' —
    # pick keys empirically so exactly one dirty record exists)
    import hashlib

    keys = [k for k in range(1, 40) if hashlib.md5(str(k).encode()).hexdigest()[0] < "4"]
    dirty_src = keys[0]
    clean_only = next(k for k in range(1, 40) if k not in keys and k != dirty_src)
    tbl = pa.table(
        {
            "c_custkey": pa.array([dirty_src, clean_only], pa.int64()),
            # identical names, different nations → same suffix, different block
            "c_name": pa.array([f"Customer#{dirty_src:09d}", f"Customer#{dirty_src:09d}"]),
            "c_nationkey": pa.array([1, 2], pa.int32()),
            "c_acctbal": pa.array([0.0, 0.0], pa.float64()),
            "c_mktsegment": pa.array(["BUILDING", "BUILDING"]),
        }
    )
    pq.write_table(tbl, f"{out}/customer.parquet")
    rows = REGISTRY["record_linkage_fuzzy"].fn(spark, out).collect()
    # exactly one match: the dirty copy of dirty_src back to dirty_src;
    # the identical-name customer in nation 2 is never considered
    assert len(rows) == 1, rows
    r = rows[0]
    assert r.matched_custkey == dirty_src and r.is_true_match and r.lev_dist == 1


def test_triangle_count_on_planted_clique(spark, tmp_path):
    """K4 on parts (10,20,30,40) has exactly 4 triangles with every
    vertex in 3 of them; a disconnected extra edge adds none."""
    from pyspark.sql import types as T

    from crm_etl_pipeline_spark.queries.crm_q import triangle_count

    rows = [(1, p) for p in (10, 20, 30, 40)] + [(2, 50), (2, 60)]
    schema = T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_partkey", T.LongType()),
        ]
    )
    spark.createDataFrame(rows, schema).write.parquet(
        str(tmp_path / "lineitem.parquet")
    )
    got = {r["part"]: r["n_triangles"] for r in triangle_count(spark, str(tmp_path)).collect()}
    assert got == {10: 3, 20: 3, 30: 3, 40: 3}


def test_funnel_empty_first_stage(spark, tmp_path):
    """A corpus with no signup events must still read out the full
    4-stage funnel — all zeros with 0.0 conversion — in BOTH engines.
    Before the guard, least(_u1, 1) read 0 and the scalar-attach
    equi-join silently dropped every stage row (Spark returned an
    EMPTY funnel while the oracle returned four rows), and the
    conversion ratio was 0/0."""
    import duckdb

    out = _write_events(
        tmp_path,
        [
            (1, "2024-01-01T10:00:00", 1, "click", 5.0),
            (2, "2024-01-01T11:00:00", 1, "view", 0.0),
            (3, "2024-01-02T09:00:00", 2, "click", 7.0),
        ],
    )
    rows = sorted(
        REGISTRY["funnel_conversion"].fn(spark, out).collect(),
        key=lambda r: r.stage_idx,
    )
    assert [r.stage_idx for r in rows] == [1, 2, 3, 4]
    assert all(r.users_reached == 0 and r.conv_from_first == 0.0 for r in rows)

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{out}/events.parquet')"
    )
    o = sorted(con.execute(REGISTRY["funnel_conversion"].oracle).fetchall())
    con.close()
    assert sorted(tuple(r) for r in rows) == o


def test_one_order_per_customer_degenerates_cleanly(spark, tmp_path):
    """A one-order-per-customer load makes the OLS regressor constant
    (zero x-variance) and empties the gains table's response window
    (history and response never share a customer): previously ANSI
    Spark raised DIVIDE_BY_ZERO on both while DuckDB emitted NaN.
    Convention — OLS slope 0 / intercept mean(y) / r2 0, gains lift
    and capture 0.0 — must hold bit-for-bit in both engines."""
    import math

    import duckdb

    fixture = pq.read_table("/root/testdata/sf0.01/orders.parquet")
    seen: set = set()
    keep = []
    for i, ck in enumerate(fixture.column("o_custkey").to_pylist()):
        if ck not in seen:
            seen.add(ck)
            keep.append(i)
    one = fixture.take(pa.array(keep, pa.int64()))
    out = str(tmp_path / "oneorder")
    os.makedirs(out, exist_ok=True)
    pq.write_table(one, f"{out}/orders.parquet")
    os.symlink("/root/testdata/sf0.01/customer.parquet", f"{out}/customer.parquet")

    con = duckdb.connect()
    for t in ("orders", "customer"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{out}/{t}.parquet')"
        )

    def canon(v):
        if v is None:
            return "NULL"
        if isinstance(v, float):
            return "NaN" if math.isnan(v) else repr(v)
        return str(v)

    for name in ("ols_frequency_monetary", "decile_gains_table"):
        q = REGISTRY[name]
        df = q.fn(spark, out)
        cols = sorted(df.columns)
        s = sorted("|".join(canon(r[c]) for c in cols) for r in df.collect())
        res = con.execute(q.oracle)
        names = [d[0] for d in res.description]
        perm = [names.index(c) for c in sorted(names)]
        o = sorted("|".join(canon(row[i]) for i in perm) for row in res.fetchall())
        assert s == o, f"{name} diverges on the one-order-per-customer load"
    ols = {r.c_mktsegment: r for r in REGISTRY["ols_frequency_monetary"].fn(spark, out).collect()}
    assert all(r.slope == 0.0 and r.r2 == 0.0 for r in ols.values())
    con.close()
