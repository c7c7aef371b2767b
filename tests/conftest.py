"""Shared fixtures: one SparkSession and one DuckDB connection per run.

The oracle comparison here is intentionally STRICTER than the driver's
(exact canonical-string equality, not just a hash) so that a green
test suite implies a green CORRECTNESS_r{N}.json.
"""

from __future__ import annotations

import math
import sys
from pathlib import Path

import duckdb
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from crm_etl_pipeline_spark.io import TABLES
from crm_etl_pipeline_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("crm-etl-pipeline-tests", cpus=8)
    yield spark


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{SF_DIR}/{name}.parquet')"
        )
    yield con
    con.close()


def canonical(value) -> str:
    """Canonical string for order-insensitive cross-engine comparison."""
    if value is None:
        return "NULL"
    if isinstance(value, float):
        if math.isnan(value):
            return "NaN"
        # exact float repr: both engines must produce bit-identical doubles
        return repr(value)
    if isinstance(value, bool):
        return str(value).lower()
    return str(value)


def rows_canonical(cols: list[str], rows: list[tuple]) -> list[str]:
    """Sort columns by name, canonicalize values, sort rows."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(canonical(r[i]) for i in order) for r in rows)


def compare_query(spark, duck, q, sf_dir: str = SF_DIR) -> None:
    """Run one registry Query on Spark and DuckDB; assert equivalence."""
    sdf = q.fn(spark, sf_dir)
    srows = [tuple(r) for r in sdf.collect()]
    scols = sdf.columns
    res = duck.execute(q.oracle)
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    assert sorted(scols) == sorted(ocols), f"{q.name}: columns {scols} vs oracle {ocols}"
    assert len(srows) == len(orows), f"{q.name}: rowcount {len(srows)} vs oracle {len(orows)}"
    scanon = rows_canonical(scols, srows)
    ocanon = rows_canonical(ocols, orows)
    mismatches = [(a, b) for a, b in zip(scanon, ocanon) if a != b]
    assert not mismatches, f"{q.name}: {len(mismatches)} row mismatches; first: {mismatches[0]}"
