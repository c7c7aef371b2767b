"""Bucketed-layout invariants: a co-located join and a bucket-key
aggregation over same-bucket-count tables must plan with ZERO
exchanges — the layout, not the optimizer, absorbs the shuffle.
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

from crm_etl_pipeline_spark import bucketing
from crm_etl_pipeline_spark.io import table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    orders = table(spark, SF_DIR, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    li = table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_quantity", "l_extendedprice")
    bucketing.write_bucketed(orders, "orders_b", "o_orderkey", 8)
    bucketing.write_bucketed(li, "lineitem_b", "l_orderkey", 8)
    yield "orders_b", "lineitem_b"
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def _plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain()
    return buf.getvalue()


def test_co_located_join_has_no_exchange(spark, bucketed_tables):
    orders_b, lineitem_b = bucketed_tables
    # disable broadcast so the join genuinely exercises the bucket layout
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketing.co_located_join(
            spark, lineitem_b, orders_b, "l_orderkey", "o_orderkey"
        )
        plan = _plan_of(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"
        # result parity with the plain parquet join
        plain = table(spark, SF_DIR, "lineitem").join(
            table(spark, SF_DIR, "orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        assert joined.count() == plain.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucket_key_aggregation_has_no_exchange(spark, bucketed_tables):
    _, lineitem_b = bucketed_tables
    agg = (
        spark.table(lineitem_b)
        .groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("qty"))
    )
    plan = _plan_of(agg)
    assert "Exchange" not in plan, f"bucket-key groupBy still shuffles:\n{plan}"


def test_sweep_reclaims_old_roots_despite_live_pid(tmp_path, monkeypatch):
    """PID reuse can make a dead run's root look 'alive' to the kill(0)
    probe forever; the age gate reclaims any root older than the
    threshold regardless of pid liveness. (Sweep now lives in tmpdirs,
    shared by every scratch family.)"""
    import os

    from crm_etl_pipeline_spark import tmpdirs

    monkeypatch.setattr(tmpdirs.tempfile, "gettempdir", lambda: str(tmp_path))
    # pid 1 is always alive, so only the age gate can reclaim this root
    old = tmp_path / "crm_etl_bucketed_1"
    old.mkdir()
    stale = 2 * tmpdirs.STALE_AGE_S
    os.utime(old, (os.path.getmtime(old) - stale,) * 2)
    # our own pid: certainly alive, and never 1 (getppid() IS 1 when the
    # test runner is reparented to init, colliding with `old` above)
    fresh = tmp_path / f"crm_etl_bucketed_{os.getpid()}"
    fresh.mkdir()
    tmpdirs._sweep_family("crm_etl_bucketed")
    assert not old.exists(), "age-gated sweep should reclaim the old root"
    assert fresh.exists(), "fresh roots of live pids must be left alone"


def test_tmpdirs_sweep_reclaims_dead_and_old_roots(tmp_path, monkeypatch):
    """The shared scratch-root sweep must reclaim (a) roots older than
    the age gate even when their suffix is not a PID, and (b) pid-
    suffixed roots whose process is gone — while leaving this process's
    root and fresh unparseable roots alone."""
    import os
    import time

    from crm_etl_pipeline_spark import tmpdirs

    monkeypatch.setattr(tmpdirs.tempfile, "gettempdir", lambda: str(tmp_path))
    fam = "sweeptest"
    old = tmp_path / f"{fam}_mkdtempXYZ"
    old.mkdir()
    os.utime(old, (time.time() - tmpdirs.STALE_AGE_S - 60,) * 2)
    dead_pid = tmp_path / f"{fam}_999999999"  # beyond pid_max: never alive
    dead_pid.mkdir()
    mine = tmp_path / f"{fam}_{os.getpid()}"
    mine.mkdir()
    fresh_unparseable = tmp_path / f"{fam}_notapid"
    fresh_unparseable.mkdir()
    tmpdirs._sweep_family(fam)
    assert not old.exists(), "age gate must reclaim regardless of suffix"
    assert not dead_pid.exists(), "dead pid root must be reclaimed"
    assert mine.exists(), "own root must survive"
    assert fresh_unparseable.exists(), "fresh non-pid root must survive"
