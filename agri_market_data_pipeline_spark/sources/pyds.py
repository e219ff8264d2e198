"""Spark 4 Python DataSource for the paginated feed — the reference's
REST harvester (fetch_data.py:64-114) as a REGISTERED SOURCE FORMAT.

Where sources/paginated_api.py builds the paged scan out of range +
mapPartitions (explicit plumbing), this is the modern idiom: a
`DataSource` subclass registered with `spark.dataSource.register`, after
which the feed is just

    spark.read.format("paged_feed").option("path", sf_dir).load()
    spark.readStream.format("paged_feed")...     (incremental, offset-
                                                  checkpointed by Spark)

The stream reader is the reference's whole operating model made native:
`initialOffset` ≡ a fresh data/progress.json, `read(start)` ≡ one
3-hourly harvest advancing the offset, and Structured Streaming's
checkpoint log replaces the hand-rolled JSON file (exactly-once per
epoch instead of at-least-once).

The backing "API server" is the same deterministic events.parquet feed
the other source-parity operators use (one page = `limit` consecutive
rows, ts column excluded — it is TIMESTAMP(NANOS)/NTZ territory, see
CLAUDE.md), so DuckDB can verify every record arrived exactly once.
"""

from __future__ import annotations

import math
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

_COLS = ["event_id", "user_id", "event_type", "value"]


_SCHEMA = "event_id bigint, user_id bigint, event_type string, value double"


def _opt(options: dict, name: str, default: str) -> str:
    # Spark normalizes DataSource option keys to lowercase
    return options.get(name.lower(), options.get(name, default))


def _events_path(sf_dir: str) -> str:
    return os.path.join(sf_dir, "events.parquet")


def _feed_rows(sf_dir: str) -> int:
    import pyarrow.parquet as pq

    return pq.ParquetFile(_events_path(sf_dir)).metadata.num_rows


def _fetch_range(sf_dir: str, start: int, end: int):
    """Rows [start, end) from the feed, as schema-ordered tuples — the
    executor-side 'HTTP fetch'. One pyarrow parse per task. Tuple form:
    the Simple stream reader prefetches ON THE DRIVER and pickles the
    iterable into the offset-ranged batch, which requires plain rows
    (the batch reader has an Arrow fast path instead, _fetch_batches)."""
    import pyarrow.parquet as pq

    table = pq.read_table(_events_path(sf_dir), columns=_COLS)
    for rec in table.slice(start, max(end - start, 0)).to_pylist():
        yield tuple(rec[c] for c in _COLS)


def _fetch_batches(sf_dir: str, start: int, end: int):
    """Rows [start, end) as pyarrow RecordBatches — the batch reader's
    zero-copy path: Spark's Python DataSource API accepts RecordBatch
    yields and ships them over Arrow, skipping per-row pickling
    entirely (~10× on wide pages)."""
    import pyarrow.parquet as pq

    table = pq.read_table(_events_path(sf_dir), columns=_COLS)
    yield from table.slice(start, max(end - start, 0)).to_batches()


class _PageRange(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class _PagedFeedBatchReader(DataSourceReader):
    def __init__(self, options: dict):
        self.sf_dir = options["path"]
        self.limit = int(_opt(options, "limit", "1000"))
        self.num_partitions = int(_opt(options, "numPartitions", "8"))

    def partitions(self):
        n_rows = _feed_rows(self.sf_dir)
        n_pages = math.ceil(n_rows / self.limit)
        per = max(1, math.ceil(n_pages / self.num_partitions))
        return [
            _PageRange(p * self.limit, min((p + per) * self.limit, n_rows))
            for p in range(0, n_pages, per)
        ]

    def read(self, partition: _PageRange):
        # page-at-a-time, like the reference's offset loop — the page
        # boundary is where retry/skip policy would attach; each page
        # travels as Arrow RecordBatches, not pickled rows
        for off in range(partition.start, partition.end, self.limit):
            yield from _fetch_batches(
                self.sf_dir, off, min(off + self.limit, partition.end)
            )


class _PagedFeedStreamReader(SimpleDataSourceStreamReader):
    """Incremental micro-batch reader: each batch consumes
    `pagesPerBatch` pages from the durable offset — fetch_data.py's
    resume loop with Spark's offset log as progress.json."""

    def __init__(self, options: dict):
        self.sf_dir = options["path"]
        self.limit = int(_opt(options, "limit", "1000"))
        self.pages_per_batch = int(_opt(options, "pagesPerBatch", "3"))

    def initialOffset(self) -> dict:
        return {"offset": 0}

    def read(self, start: dict):
        begin = start["offset"]
        n_rows = _feed_rows(self.sf_dir)
        if begin >= n_rows:
            return ([], start)  # caught up; offset unchanged
        end = min(begin + self.pages_per_batch * self.limit, n_rows)
        # materialized list, not a generator: the runner's prefetch cache
        # copies the iterable (Simple readers prefetch on the driver)
        return (list(_fetch_range(self.sf_dir, begin, end)), {"offset": end})

    def readBetweenOffsets(self, start: dict, end: dict):
        # deterministic replay for recovery — same range, same rows
        return list(_fetch_range(self.sf_dir, start["offset"], end["offset"]))


class PagedFeedDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "paged_feed"

    def schema(self) -> str:
        return _SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return _PagedFeedBatchReader(dict(self.options))

    def simpleStreamReader(self, schema) -> SimpleDataSourceStreamReader:
        return _PagedFeedStreamReader(dict(self.options))


def register(spark) -> None:
    spark.dataSource.register(PagedFeedDataSource)
