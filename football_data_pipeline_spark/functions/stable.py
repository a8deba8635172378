"""Order-stable float aggregation.

Summing doubles is order-dependent; Spark and DuckDB (and any two
cluster runs with different partitionings!) can disagree in the last
ulps, which flips ROUND(sum, 2) when the true value sits near a .xx5
boundary — a real hash-mismatch observed at sf0.001 on q_star_join.

Fix: cast each term to DECIMAL(28,4) before summing. Per-row double
arithmetic is IEEE-deterministic and identical across engines; the
decimal sum is exact integer arithmetic, hence order-independent and
engine-independent. The result is cast back to DOUBLE and rounded for
presentation. This also makes results reproducible across cluster
sizes — a correctness property worth having at 100 TB, not just an
oracle trick.

Oracle-side equivalents (DuckDB):
    dsum  → round(CAST(sum(CAST(x AS DECIMAL(28,4))) AS DOUBLE), 2)
    davg  → round(CAST(sum(CAST(x AS DECIMAL(28,4))) AS DOUBLE)
                  / count(x), 2)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DECIMAL = "decimal(28,4)"


def dsum(col: Column | str, round_to: int = 2) -> Column:
    """Order-stable SUM of a double expression, rounded for output."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(F.sum(c.cast(DECIMAL)).cast("double"), round_to)


def davg(col: Column | str, round_to: int = 2) -> Column:
    """Order-stable AVG: exact decimal sum / non-null count."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(F.sum(c.cast(DECIMAL)).cast("double") / F.count(c), round_to)


def oracle_dsum(expr: str, round_to: int = 2) -> str:
    return f"round(CAST(sum(CAST({expr} AS DECIMAL(28,4))) AS DOUBLE), {round_to})"


def oracle_davg(expr: str, round_to: int = 2) -> str:
    return (
        f"round(CAST(sum(CAST({expr} AS DECIMAL(28,4))) AS DOUBLE)"
        f" / count({expr}), {round_to})"
    )
