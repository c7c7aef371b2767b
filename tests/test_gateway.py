"""Gateway rate-limit semantics: the two-stage window-rank admission
must be EXACTLY the greedy sequential limiter, at both the
fixture-calibrated and the published production caps (the
nested-fixed-window equivalence argued in gateway_q's docstring,
verified here against a pure-Python reference limiter on a planted
burst that exercises both throttle branches)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import types as T

from crm_etl_pipeline_spark.queries import gateway_q


def _sequential_limiter(rows, minute_cap, hour_cap):
    """Greedy token-bucket with nested fixed windows: process calls in
    (ts, event_id) order; only ADMITTED calls consume quota."""
    minute_used: dict = {}
    hour_used: dict = {}
    admitted = {}
    for event_id, ts in sorted(rows, key=lambda r: (r[1], r[0])):
        m = ts.replace(second=0, microsecond=0)
        h = ts.replace(minute=0, second=0, microsecond=0)
        ok = minute_used.get(m, 0) < minute_cap and hour_used.get(h, 0) < hour_cap
        if ok:
            minute_used[m] = minute_used.get(m, 0) + 1
            hour_used[h] = hour_used.get(h, 0) + 1
        admitted[event_id] = ok
    return admitted


def _planted_burst():
    """A burst log that exercises both caps: minute 0 has 40 calls
    (minute cap binds at every calibration), then a sustained 10/min
    for the rest of the hour (hour cap binds), then a sparse second
    hour (nothing binds)."""
    base = dt.datetime(2024, 3, 1, 9, 0, 0)
    rows = []
    eid = 0
    for i in range(40):  # burst minute
        rows.append((eid, base + dt.timedelta(seconds=i)))
        eid += 1
    for minute in range(1, 60):  # sustained pressure
        for i in range(10):
            rows.append((eid, base + dt.timedelta(minutes=minute, seconds=3 * i)))
            eid += 1
    for minute in range(0, 60, 7):  # sparse second hour
        rows.append((eid, base + dt.timedelta(hours=1, minutes=minute)))
        eid += 1
    return rows


def _write_events(spark, tmp_path, rows):
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    spark.createDataFrame(rows, schema).write.parquet(str(tmp_path / "events.parquet"))
    return str(tmp_path)


def test_admission_matches_sequential_limiter_both_calibrations(spark, tmp_path):
    rows = _planted_burst()
    sf_dir = _write_events(spark, tmp_path, rows)
    for minute_cap, hour_cap in [
        (gateway_q._MINUTE_CAP, gateway_q._HOUR_CAP),
        (gateway_q._PROD_MINUTE_CAP, gateway_q._PROD_HOUR_CAP),
    ]:
        want = _sequential_limiter(rows, minute_cap, hour_cap)
        got = {
            r["event_id"]: r["admitted"]
            for r in gateway_q.rate_limited_calls(
                spark, sf_dir, minute_cap=minute_cap, hour_cap=hour_cap
            ).collect()
        }
        assert got == want, f"divergence at caps {minute_cap}/{hour_cap}"


def test_throttle_reasons_partition_the_rejections(spark, tmp_path):
    rows = _planted_burst()
    sf_dir = _write_events(spark, tmp_path, rows)
    calls = gateway_q.rate_limited_calls(spark, sf_dir).collect()
    n_min = sum(1 for r in calls if r["throttle_reason"] == "minute_cap")
    n_hr = sum(1 for r in calls if r["throttle_reason"] == "hour_cap")
    n_adm = sum(1 for r in calls if r["admitted"])
    assert n_min > 0 and n_hr > 0  # both branches fired on the planted burst
    assert n_adm + n_min + n_hr == len(rows)
    for r in calls:
        assert r["admitted"] == (r["throttle_reason"] is None)


def test_rotation_slots_are_contiguous_and_round_robin(spark):
    out = gateway_q.credential_rotation_schedule(
        spark, "/root/testdata/sf0.01"
    ).collect()
    slots = sorted(r["rotation_slot"] for r in out)
    assert slots == list(range(len(slots)))  # no gaps in the schedule
    for r in out:
        assert r["cred_id"] == r["rotation_slot"] % gateway_q._N_CREDS
        assert r["first_call"] <= r["last_call"]
        # every slot except the last is exactly the rotation threshold
        if r["rotation_slot"] < len(slots) - 1:
            assert r["n_calls"] == gateway_q._ROTATE_EVERY


def _sequential_limiter_deliveries(rows, minute_cap, hour_cap):
    """Delivery-grain twin of _sequential_limiter: processes EVERY row
    (duplicates included — each at-least-once re-send is its own API
    call consuming its own quota) and returns the admitted multiset."""
    minute_used: dict = {}
    hour_used: dict = {}
    out = []
    for event_id, ts in sorted(rows, key=lambda r: (r[1], r[0])):
        m = ts.replace(second=0, microsecond=0)
        h = ts.replace(minute=0, second=0, microsecond=0)
        ok = minute_used.get(m, 0) < minute_cap and hour_used.get(h, 0) < hour_cap
        if ok:
            minute_used[m] = minute_used.get(m, 0) + 1
            hour_used[h] = hour_used.get(h, 0) + 1
        out.append((event_id, ok))
    return sorted(out)


def test_duplicated_deliveries_each_consume_quota(spark, tmp_path):
    """The round-9 dup_events contract: a byte-identical re-send is a
    second call. One output row per delivery (the old event_id
    join-back cross-matched the copies: 2 deliveries -> 4 rows), and
    the admitted multiset equals the sequential limiter processing
    every delivery. Duplicated copies tie on (ts, event_id); being
    byte-identical, either engine-side order yields the same multiset."""
    rows = _planted_burst()
    dup = rows + [r for i, r in enumerate(rows) if i % 7 == 0]
    sf_dir = _write_events(spark, tmp_path, dup)
    got = gateway_q.rate_limited_calls(spark, sf_dir).collect()
    assert len(got) == len(dup)  # delivery grain: no join explosion
    want = _sequential_limiter_deliveries(
        dup, gateway_q._MINUTE_CAP, gateway_q._HOUR_CAP
    )
    assert sorted((r["event_id"], r["admitted"]) for r in got) == want


def test_duplicated_deliveries_count_in_rotation_and_backoff(spark, tmp_path_factory):
    """Count-sensitivity pins for the other two gateway queries: a
    duplicated delivery takes its own rotation-sequence slot and its
    own backoff penalty — total call counts scale with deliveries, not
    distinct event ids (mirrors PodioApiGateway.py:153-156)."""
    import pyarrow.parquet as pq_mod
    import pyarrow as pa

    src = "/root/testdata/sf0.01"
    out = tmp_path_factory.mktemp("dupgw")
    for t in ("region nation customer supplier part orders lineitem "
              "documents embeddings").split():
        (out / f"{t}.parquet").symlink_to(f"{src}/{t}.parquet")
    ev = pq_mod.read_table(f"{src}/events.parquet")
    dup = pa.concat_tables([ev, ev.slice(0, ev.num_rows // 7)])
    pq_mod.write_table(dup, str(out / "events.parquet"))

    rot = gateway_q.credential_rotation_schedule(spark, str(out)).collect()
    assert sum(r["n_calls"] for r in rot) == dup.num_rows
    # slots stay exactly the rotation threshold — duplicates fill them
    for r in rot:
        if r["rotation_slot"] < len(rot) - 1:
            assert r["n_calls"] == gateway_q._ROTATE_EVERY

    base = {
        r["failed_attempts"]: r["n_events"]
        for r in gateway_q.backoff_penalty_audit(spark, src).collect()
    }
    dupd = {
        r["failed_attempts"]: r["n_events"]
        for r in gateway_q.backoff_penalty_audit(spark, str(out)).collect()
    }
    assert sum(dupd.values()) > sum(base.values())  # penalties accrue per delivery
    assert all(dupd[k] >= v for k, v in base.items())


# -- property check: greedy equivalence on hypothesis-generated bursts -------

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# second offsets inside a 2-hour span, with repeats (same-second calls
# tie-broken by event_id) and adversarial clustering around boundaries
_offsets = st.lists(
    st.integers(min_value=0, max_value=7199), min_size=1, max_size=300
)
_caps = st.sampled_from([(1, 5), (2, 20), (3, 7), (15, 250)])


@pytest.mark.usefixtures("spark")
class TestRateLimitProperty:
    @given(offsets=_offsets, caps=_caps)
    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def test_random_bursts_match_sequential_limiter(self, spark, tmp_path_factory, offsets, caps):
        rows = [
            (i, dt.datetime(2024, 5, 1, 6, 0, 0) + dt.timedelta(seconds=off))
            for i, off in enumerate(sorted(offsets))
        ]
        tmp = tmp_path_factory.mktemp("rl")
        sf_dir = _write_events(spark, tmp, rows)
        minute_cap, hour_cap = caps
        want = _sequential_limiter(rows, minute_cap, hour_cap)
        got = {
            r["event_id"]: r["admitted"]
            for r in gateway_q.rate_limited_calls(
                spark, sf_dir, minute_cap=minute_cap, hour_cap=hour_cap
            ).collect()
        }
        assert got == want
