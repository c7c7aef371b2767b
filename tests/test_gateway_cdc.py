"""CDC derive/apply roundtrip and incremental-state merge properties —
the invariants the oracles can't express: applying the derived change
set reproduces the target snapshot, and partial-state merge is
associative across any delta split."""

from __future__ import annotations

from functools import reduce

from pyspark.sql import functions as F

from crm_etl_pipeline_spark.io import table
from crm_etl_pipeline_spark.queries import events_q
from crm_etl_pipeline_spark.queries.aggregates import _priority_state

SF_DIR = "/root/testdata/sf0.01"


def test_cdc_roundtrip_derive_then_apply(spark):
    """apply(snapshot_A, derive(A, B)) == snapshot_B, key for key."""
    a = events_q._snapshot_asof(spark, SF_DIR, events_q._CDC_CUTOFF)
    b = events_q._snapshot_asof(spark, SF_DIR, None)
    changes = events_q.cdc_derive_changes(spark, SF_DIR)

    kept = a.join(
        changes.filter(F.col("op").isin("D", "U")).select("user_id"),
        "user_id",
        "left_anti",
    )
    upserts = changes.filter(F.col("op").isin("I", "U")).select(
        "user_id",
        F.col("new_ts").alias("img_ts"),
        F.col("new_value").alias("img_value"),
    )
    rebuilt = sorted(tuple(r) for r in kept.unionByName(upserts).collect())
    want = sorted(tuple(r) for r in b.collect())
    assert rebuilt == want


def test_cdc_change_set_is_minimal_and_nonempty(spark):
    rows = events_q.cdc_derive_changes(spark, SF_DIR).collect()
    ops = {r["op"] for r in rows}
    assert "I" in ops and "U" in ops  # both branches fire at sf0.01
    for r in rows:
        if r["op"] == "U":
            assert r["old_ts"] != r["new_ts"]  # no no-op updates emitted
        if r["op"] == "D":
            assert r["new_ts"] is None and r["new_value"] is None


def _merge(a, b):
    return (
        a.alias("a")
        .join(b.alias("b"), F.col("a.o_orderpriority") == F.col("b.o_orderpriority"), "full_outer")
        .select(
            F.coalesce(F.col("a.o_orderpriority"), F.col("b.o_orderpriority")).alias("o_orderpriority"),
            (
                F.coalesce(F.col("a.n_orders"), F.lit(0))
                + F.coalesce(F.col("b.n_orders"), F.lit(0))
            ).alias("n_orders"),
            (
                F.coalesce(F.col("a.s_price"), F.lit(0).cast("decimal(18,2)"))
                + F.coalesce(F.col("b.s_price"), F.lit(0).cast("decimal(18,2)"))
            ).alias("s_price"),
        )
    )


def test_state_merge_associative_across_three_deltas(spark):
    """Splitting the table into 3 date ranges and merging their partial
    states (in either association order) equals the direct aggregate —
    the property that makes compaction cadence free to vary."""
    orders = table(spark, SF_DIR, "orders").select(
        "o_orderpriority", "o_totalprice", "o_orderdate"
    )
    c1, c2 = F.lit("1994-01-01").cast("date"), F.lit("1996-01-01").cast("date")
    parts = [
        _priority_state(orders.filter(F.col("o_orderdate") < c1)),
        _priority_state(orders.filter((F.col("o_orderdate") >= c1) & (F.col("o_orderdate") < c2))),
        _priority_state(orders.filter(F.col("o_orderdate") >= c2)),
    ]
    left_assoc = sorted(tuple(r) for r in reduce(_merge, parts).collect())
    right_assoc = sorted(tuple(r) for r in _merge(parts[0], _merge(parts[1], parts[2])).collect())
    direct = sorted(tuple(r) for r in _priority_state(orders).collect())
    assert left_assoc == direct
    assert right_assoc == direct
