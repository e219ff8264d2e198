"""tables.py contracts: the dual-layout events reader.

The driver has shipped events.parquet in two physical layouts across
testdata generations — INT64 TIMESTAMP(NANOS) (the vectorized reader
throws PARQUET_TYPE_ILLEGAL on a raw read) and plain timestamp[us] /
TIMESTAMP_NTZ. Whichever one the CURRENT testdata uses, only that
branch of load_events runs at the gate; these tests synthesize BOTH
layouts so a driver-side regeneration can never surprise the reader.
"""

from __future__ import annotations

import datetime

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from agri_market_data_pipeline_spark.tables import (
    events_ts_is_nanos,
    load_events,
)

_TS = [
    datetime.datetime(2024, 1, 1, 0, 0, 0, 123456),
    datetime.datetime(2024, 1, 2, 13, 37, 59, 999999),
    datetime.datetime(2024, 6, 30, 23, 59, 59, 1),
]


def _write_events(dirpath, unit: str) -> None:
    table = pa.table(
        {
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "ts": pa.array(_TS, pa.timestamp(unit)),
            "user_id": pa.array([10, 20, 30], pa.int64()),
            "event_type": pa.array(["a", "b", "c"]),
            "value": pa.array([1.0, 2.0, 3.0], pa.float64()),
        }
    )
    # version='2.6' keeps ns as INT64 TIMESTAMP(NANOS) instead of
    # silently coercing to µs — the exact layout that breaks a raw read
    pq.write_table(table, str(dirpath / "events.parquet"), version="2.6")


@pytest.mark.parametrize("unit", ["ns", "us"])
def test_load_events_normalizes_both_layouts(spark, tmp_path, unit):
    _write_events(tmp_path, unit)
    assert events_ts_is_nanos(str(tmp_path)) == (unit == "ns")

    df = load_events(spark, str(tmp_path))
    assert df.schema["ts"].dataType.simpleString() == "timestamp"
    got = [r.ts for r in df.orderBy("event_id").collect()]
    # value-preserving down to the microsecond in BOTH layouts (the
    # nanos branch must use integral div — float division would round
    # ±1 µs at epoch-nanos magnitudes)
    assert got == _TS, got


def test_load_events_nanos_conf_is_restored(spark, tmp_path):
    """The legacy nanosAsLong conf is scoped to the read — leaking it
    session-wide would turn TIMESTAMP(NANOS) columns in unrelated reads
    into BIGINTs."""
    _write_events(tmp_path, "ns")
    load_events(spark, str(tmp_path))
    assert (
        spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false")
        == "false"
    )
