"""Every registered query with an oracle must match DuckDB exactly
(row count + column names + canonical values) at sf0.001 — the same
contract the driver enforces at sf0.01."""

from __future__ import annotations

import pytest

from crm_etl_pipeline_spark.registry import load_all

from tests.conftest import compare_query

REGISTRY = load_all()


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(spark, duck, name):
    q = REGISTRY[name]
    if q.oracle is None:
        df = q.fn(spark, "/root/testdata/sf0.001")
        assert df.count() >= 0  # rows-only smoke, mirrors driver's weak check
    else:
        compare_query(spark, duck, q)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert len(df.columns) >= 2


def test_driver_contract_shape():
    import __spark_entry__ as e

    qs = e.queries()
    os_ = e.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) >= 1
