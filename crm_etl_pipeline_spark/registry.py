"""Query registry: the single source of truth for the driver contract.

Every implemented operator from SURVEY.md §2 registers itself here with
(a) a PySpark callable ``(spark, sf_dir) -> DataFrame`` and (b) an
equivalent DuckDB-runnable ANSI SQL oracle string (or ``None`` for
genuinely non-SQL-expressible ops, which the driver checks rows-only).

Cross-engine determinism rules every registered query follows:
- money-like double aggregates accumulate in DECIMAL (exact) in BOTH
  engines and cast to double only at the end, so value hashes match
  bit-for-bit regardless of summation order;
- every computed column is aliased identically in Spark and SQL;
- no query relies on implicit output ordering (driver hash is
  order-insensitive) but ties in top-k queries are broken by a key.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL; None => rows-only check
    survey_ids: str  # SURVEY.md §2 operator ids this query covers


REGISTRY: dict[str, Query] = {}


def query(name: str, oracle: str | None = None, survey: str = "") -> Callable[[QueryFn], QueryFn]:
    """Decorator registering one driver-visible query."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, survey_ids=survey)
        return fn

    return deco


def load_all() -> dict[str, Query]:
    """Import every query module (side effect: fills REGISTRY).

    The returned dict is ordered with ``queries.DRIVER_PRIORITY`` first:
    the driver's correctness harness samples a bounded prefix of the
    registry in iteration order, so queries that have not yet been
    driver-verified (or changed this round) are listed before queries
    already green in previous rounds. Pure reordering — every query is
    always present exactly once.
    """
    from crm_etl_pipeline_spark import queries  # noqa: F401  (imports submodules)

    priority = [n for n in queries.DRIVER_PRIORITY if n in REGISTRY]
    ordered = {n: REGISTRY[n] for n in priority}
    ordered.update((n, q) for n, q in REGISTRY.items() if n not in ordered)
    return ordered
