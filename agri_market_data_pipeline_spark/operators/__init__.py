"""Operator library — importing this package registers every query.

One module per SURVEY.md §2 category; each operator is a function
``(spark, sf_dir) -> DataFrame`` registered via ``registry.query`` with
its DuckDB oracle twin.
"""

from . import (  # noqa: F401
    aggregations,
    analytics,
    asof,
    dedup,
    geo,
    graph,
    ingest_parity,
    joins,
    multimodal,
    projection,
    quality_stats,
    reshape,
    scans,
    scalar_fns,
    setops,
    similarity,
    skew,
    sortlimit,
    sources_parity,
    storage_layout,
    textstats,
    timeseries,
    traindata,
    udfs,
    windows,
)

# Streaming operators register through the same decorator; importing the
# package completes the registry.
from ..streaming import ops as _streaming_ops  # noqa: E402,F401
