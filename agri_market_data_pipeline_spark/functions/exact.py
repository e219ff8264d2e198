"""Cross-engine-deterministic aggregate expressions.

Floating-point SUM is order-dependent; Spark's partial/final hash
aggregation and DuckDB's execution will generally sum in different
orders, so ``SUM(double)`` hash-compares unreliably. We accumulate in
DECIMAL (exact, associative, order-independent) and cast the final value
back to DOUBLE — bitwise identical across engines. AVG follows as
exact-sum / count evaluated in double on both sides.

SQL twins (DuckDB):
    CAST(SUM(CAST(x AS DECIMAL(30,6))) AS DOUBLE)
    CAST(SUM(CAST(x AS DECIMAL(30,6))) AS DOUBLE) / COUNT(x)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(30,6)"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dsum(col: Column | str) -> Column:
    """Order-independent SUM of a double column (exact decimal path)."""
    return F.sum(_c(col).cast(DEC)).cast("double")


def davg(col: Column | str) -> Column:
    """Order-independent AVG: exact sum in double / non-null count."""
    c = _c(col)
    return dsum(c) / F.count(c)


def sql_dsum(expr: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(30,6))) AS DOUBLE)"


def sql_davg(expr: str) -> str:
    return f"{sql_dsum(expr)} / COUNT({expr})"
