"""Physical-plan introspection helpers (SURVEY.md §4 discipline)."""

from .audit import (
    exchange_count,
    explain_str,
    has_broadcast_join,
    has_partial_agg,
    pushed_filters,
)

__all__ = [
    "exchange_count",
    "explain_str",
    "has_broadcast_join",
    "has_partial_agg",
    "pushed_filters",
]
