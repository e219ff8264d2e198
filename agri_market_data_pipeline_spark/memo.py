"""Registry for module-level memo caches that hold COMPUTED DATA.

Two classes of memo live in this package, and they follow different
rules (OPTIMIZATION_r13 / VERDICT r12 item 2):

1. **Data memos** — checkpointed DataFrames (index builds, stored-side
   assignments, curation stage frames). These model "in production the
   index/table is built at write time and persisted", which is honest
   for repeated *serving* calls inside one invocation, but across bench
   samples it silently shifts the build out of the timed region (the
   untimed warm-up pays it, the 3 timed samples never do). Every data
   memo registers here, and ``bench.py``/``tools/qbench.py`` call
   :func:`clear_all` between samples so EVERY timed invocation pays its
   own builds. Eviction unpersists the checkpointed RDD blocks
   (``spark.catalog.clearCache()`` does not see localCheckpoint blocks
   — CLAUDE.md), fixing the ADVICE r12 stranded-block note.

2. **Metadata memos** — immutable logical plans (``tables._LOAD_CACHE``),
   parquet-footer row counts, and one-row plan-shape statistics
   (``tables.max_group_count``, ``textstats._distinct_token_count``).
   At 100 TB these are metastore/table statistics, not computation over
   the data; they stay memoized and are NOT registered here.

Fixture-materialization path caches (``_CSV_CACHE`` etc.) hold paths of
alternate-format *input* copies — inputs, not results — and also stay.
"""

from __future__ import annotations

from typing import Any

_REGISTRY: list[dict] = []


def register(cache: dict) -> dict:
    """Register a data-memo dict; returns it so modules can write
    ``_FOO_CACHE = memo.register({})`` at definition site."""
    _REGISTRY.append(cache)
    return cache


def _unpersist_value(value: Any) -> None:
    """Drop executor storage held by a memoized value: localCheckpoint
    RDD blocks (via the LogicalRDD's checkpointed RDD) and any plain
    persist() storage. Tuples/lists of DataFrames are walked."""
    items = value if isinstance(value, (tuple, list)) else (value,)
    for item in items:
        jdf = getattr(item, "_jdf", None)
        if jdf is None:
            continue
        try:
            # A localCheckpointed Dataset's analyzed plan is a
            # LogicalRDD wrapping the checkpointed (persisted) RDD;
            # unpersist it directly — catalog.clearCache()/df.unpersist()
            # never reach these blocks.
            jdf.queryExecution().analyzed().rdd().unpersist(False)
        except Exception:
            pass
        try:
            item.unpersist(False)
        except Exception:
            pass


def evict(cache: dict, key: Any = None) -> None:
    """Remove one entry (or all) from a data memo, unpersisting any
    checkpointed blocks the evicted value holds."""
    if key is None:
        for v in list(cache.values()):
            _unpersist_value(v)
        cache.clear()
    elif key in cache:
        _unpersist_value(cache.pop(key))


def clear_all() -> None:
    """Evict every registered data memo — the bench sample boundary."""
    for cache in _REGISTRY:
        evict(cache)
