"""memo.py — the data-memo registry bench.py clears between timed
samples (VERDICT r12 item 2): eviction must actually drop the
localCheckpoint RDD blocks (catalog.clearCache() never sees them), and
operators must rebuild correctly after a clear (the first timed sample
after the untimed warm-up pays the build from scratch)."""

from __future__ import annotations

from agri_market_data_pipeline_spark import memo


def _n_persistent(spark) -> int:
    return spark.sparkContext._jsc.sc().getPersistentRDDs().size()


def test_clear_all_unpersists_checkpoint_blocks(spark):
    base = _n_persistent(spark)
    df = spark.range(10_000).selectExpr("id", "id * 2 AS v").localCheckpoint(
        eager=True
    )
    pair = (
        spark.range(100).localCheckpoint(eager=True),
        "not-a-dataframe",
    )
    cache = memo.register({})
    try:
        cache["a"] = df
        cache["b"] = pair  # tuple values (the _PQ_INDEX_CACHE shape)
        assert _n_persistent(spark) >= base + 2
        memo.clear_all()
        assert not cache
        # clear_all may also evict operator memos populated by earlier
        # tests (session-scoped Spark), so <= not ==
        assert _n_persistent(spark) <= base
    finally:
        # remove by IDENTITY — list.remove uses ==, and an emptied
        # dict equals every other emptied registry entry
        memo._REGISTRY[:] = [c for c in memo._REGISTRY if c is not cache]


def test_evict_single_key_leaves_others(spark):
    base = _n_persistent(spark)
    cache = memo.register({})
    try:
        cache["keep"] = spark.range(10).localCheckpoint(eager=True)
        cache["drop"] = spark.range(10).localCheckpoint(eager=True)
        assert _n_persistent(spark) == base + 2
        memo.evict(cache, "drop")
        assert "keep" in cache and "drop" not in cache
        assert _n_persistent(spark) == base + 1
        # the surviving frame is still executable
        assert cache["keep"].count() == 10
        memo.evict(cache, "missing")  # no-op
        assert _n_persistent(spark) == base + 1
    finally:
        memo.evict(cache)
        # remove by IDENTITY — list.remove uses ==, and an emptied
        # dict equals every other emptied registry entry
        memo._REGISTRY[:] = [c for c in memo._REGISTRY if c is not cache]


def test_operators_rebuild_after_clear(spark, sf_dir):
    """A memoized index build evicted by clear_all() is rebuilt on the
    next call with identical results — the bench sample boundary."""
    from agri_market_data_pipeline_spark.operators.dedup import (
        _MINHASH_BANDS_CACHE,
        _minhash_bands,
    )

    first = _minhash_bands(spark, sf_dir)
    rows_first = sorted(map(tuple, first.collect()))
    assert _MINHASH_BANDS_CACHE
    memo.clear_all()
    assert not _MINHASH_BANDS_CACHE
    second = _minhash_bands(spark, sf_dir)
    assert second is not first
    rows_second = sorted(map(tuple, second.collect()))
    assert rows_first == rows_second
    memo.clear_all()
