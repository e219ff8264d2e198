"""Snapshot-versioned store — the reference's `git push` publication
model (sink_git_commit, run.yml:29-35) as a storage primitive.

The reference's durability story is "the repo IS the database": every
cron run commits data + checkpoint to git, so history is queryable via
checkouts. Delta Lake's transaction log is the industrial form; this
module is the dependency-free equivalent the engine ships with:

- each publish writes a NEW immutable version directory, then atomically
  repoints `MANIFEST.json` (os.replace) — readers never see a torn
  table, exactly git's ref-update semantics;
- `read(version=N)` is time travel (`git checkout <rev>` ≡ reading an
  old manifest entry);
- old versions are retained until `vacuum(keep_last)` — `git gc`.

At 100 TB the version directory holds only NEW/CHANGED files plus a
file-list manifest (like Delta's add/remove log), not a full copy; the
full-copy form here keeps the semantics testable without bookkeeping.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession


class SnapshotStore:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    @property
    def _manifest_path(self) -> str:
        return os.path.join(self.root, "MANIFEST.json")

    def _manifest(self) -> dict:
        try:
            with open(self._manifest_path) as fh:
                return json.load(fh)
        except (OSError, json.JSONDecodeError):
            return {"current": None, "versions": []}

    def current_version(self) -> int | None:
        return self._manifest()["current"]

    def versions(self) -> list[int]:
        return list(self._manifest()["versions"])

    def publish(self, df: DataFrame) -> int:
        """Write df as the next version; atomically repoint the manifest.
        A crash before the manifest swap leaves the old version live and
        the half-written directory unreferenced (vacuumable) — never a
        torn table."""
        m = self._manifest()
        version = (m["current"] or 0) + 1
        vdir = os.path.join(self.root, f"v{version}")
        df.write.mode("overwrite").parquet(vdir)
        m = {"current": version, "versions": m["versions"] + [version]}
        fd, tmp = tempfile.mkstemp(dir=self.root, prefix=".manifest_")
        with os.fdopen(fd, "w") as fh:
            json.dump(m, fh)
        os.replace(tmp, self._manifest_path)
        return version

    def read(self, spark: SparkSession, version: int | None = None) -> DataFrame:
        m = self._manifest()
        v = version if version is not None else m["current"]
        if v is None or v not in m["versions"]:
            raise ValueError(f"no such version {v!r}; have {m['versions']}")
        return spark.read.parquet(os.path.join(self.root, f"v{v}"))

    def vacuum(self, keep_last: int = 2) -> list[int]:
        """Drop all but the newest keep_last versions (never the current)."""
        m = self._manifest()
        keep = set(m["versions"][-keep_last:]) | {m["current"]}
        dropped = []
        for v in m["versions"]:
            if v not in keep:
                shutil.rmtree(os.path.join(self.root, f"v{v}"), ignore_errors=True)
                dropped.append(v)
        m["versions"] = [v for v in m["versions"] if v in keep]
        fd, tmp = tempfile.mkstemp(dir=self.root, prefix=".manifest_")
        with os.fdopen(fd, "w") as fh:
            json.dump(m, fh)
        os.replace(tmp, self._manifest_path)
        return dropped
