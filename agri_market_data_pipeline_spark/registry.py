"""Query/oracle registry consumed by ``__spark_entry__.py``.

Every operator from SURVEY.md §2 registers here as

    @query("op_id", oracle="SELECT ... -- DuckDB-runnable ANSI SQL")
    def op(spark, sf_dir) -> DataFrame: ...

Contract (driver): the Spark result and the DuckDB oracle result are
compared by row count + schema + order-insensitive value hash, with
columns sorted by name — so every computed column is aliased to the SAME
name on both sides. Operators whose semantics are not SQL-expressible
(LSH, streaming state) register with ``oracle=None`` → rows-only check.

Determinism rules used throughout the operator library:

- double SUMs go through ``DECIMAL(30,6)`` accumulation then CAST back to
  DOUBLE: exact, order-independent, bitwise-equal across engines;
- AVG is computed as exact-sum / count in double on both sides;
- inherently order-sensitive float reductions (stddev) are ROUNDed on
  both sides;
- window orderings always include a unique tiebreaker key.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query id {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle.strip()
        return fn
    return deco


def all_queries() -> dict[str, QueryFn]:
    # Import triggers registration of every operator module.
    from . import operators  # noqa: F401
    return dict(QUERIES)


def all_oracles() -> dict[str, str]:
    from . import operators  # noqa: F401
    return dict(ORACLE)
