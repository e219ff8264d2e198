"""Structured Streaming operators (SURVEY.md §2.B stream_*).

The reference is a micro-batch incremental stream in disguise: an
unbounded REST source consumed 1,000 rows at a time with a durable
offset checkpoint and a 3-hour trigger (fetch_data.py:17,45-59,138-165;
run.yml:6). This package is that loop made native: file-source streams,
Trigger.AvailableNow (bounded, deterministic replay — the testable form
of the 3-hour batch), watermarks, streaming dedup, and custom
per-key state.
"""

from . import ops  # noqa: F401
