"""Durable offset checkpointing (SURVEY.md §2.A chk_offset_resume).

The reference keeps `{"last_offset": N}` in data/progress.json
(fetch_data.py:45-59) and writes it AFTER appending data
(fetch_data.py:158-162) — so a crash between the two replays the page
on restart (at-least-once). This module keeps the same simple
high-watermark model but:

- writes are atomic (write-new + rename), so a torn write can't corrupt
  the checkpoint (the reference restarts from 0 on corrupt JSON);
- the ingestion flow pairs it with an idempotent sink (sinks.merge_upsert
  or dedup_exact), converting at-least-once into effectively-once.

For continuous streams, Structured Streaming's checkpointLocation
replaces this entirely (offset log + state store, exactly-once per
epoch); this high-watermark table is for the batch-incremental mode.
"""

from __future__ import annotations

import json
import os
import tempfile


class OffsetCheckpoint:
    def __init__(self, path: str):
        self.path = path

    def load(self) -> int:
        """Read the high watermark; missing or corrupt file → 0
        (the reference's restart-at-zero behavior, fetch_data.py:49-55,
        minus the silent data duplication because our sink dedups)."""
        try:
            with open(self.path) as fh:
                return int(json.load(fh)["last_offset"])
        except (OSError, ValueError, KeyError, TypeError, json.JSONDecodeError):
            return 0

    def save(self, offset: int) -> None:
        """Atomic write: tmp file + rename (POSIX rename is atomic on one
        filesystem), so readers never observe a torn checkpoint."""
        d = os.path.dirname(os.path.abspath(self.path))
        os.makedirs(d, exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=d, prefix=".progress_")
        try:
            with os.fdopen(fd, "w") as fh:
                json.dump({"last_offset": int(offset)}, fh)
            os.replace(tmp, self.path)
        except BaseException:
            try:
                os.unlink(tmp)
            except OSError:
                pass
            raise
