"""Query registry — the single source of truth the driver consumes.

Every implemented operator from SURVEY.md §2 registers here as a
``(name, spark_fn, oracle_sql)`` triple via the ``@query`` decorator.
``__spark_entry__.queries()`` / ``oracle_sql()`` and the pytest oracle
harness all read from this registry, so a query is tested exactly the
way the driver will run it.

Contract notes (driver compare is order-insensitive but name/value
exact):
- alias every computed column identically in Spark and SQL;
- round float aggregates (ROUND(x, 2)) on BOTH sides so engine-order
  float summation noise cannot flip the value hash;
- make every window/top-k deterministic with explicit tie-breaks;
- CAST integer SUMs to BIGINT in the DuckDB oracle — DuckDB sums
  integers into HUGEINT (→ float in pandas), Spark into LONG.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from .session import configure_for_oracle

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class RegisteredQuery:
    name: str
    fn: SparkQuery
    oracle: str | None  # ANSI SQL for DuckDB; None → rows-only check
    doc: str = ""


QUERIES: dict[str, RegisteredQuery] = {}


def query(name: str, oracle: str | None = None) -> Callable[[SparkQuery], SparkQuery]:
    """Register a driver-checkable query.

    The wrapped callable receives (spark, sf_dir) and must return a
    lazy DataFrame. The wrapper pins session confs needed for oracle
    parity (UTC timestamps) without assuming who built the session.
    """

    def deco(fn: SparkQuery) -> SparkQuery:
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            configure_for_oracle(spark)
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = RegisteredQuery(name, wrapped, oracle, fn.__doc__ or "")
        return wrapped

    return deco


def spark_queries() -> dict[str, SparkQuery]:
    return {name: q.fn for name, q in QUERIES.items()}


def oracle_sqls() -> dict[str, str]:
    return {name: q.oracle for name, q in QUERIES.items() if q.oracle is not None}
