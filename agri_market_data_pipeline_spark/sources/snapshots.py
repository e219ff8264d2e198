"""Snapshot-versioned store — the reference's `git push` publication
model (sink_git_commit, run.yml:29-35) as a storage primitive.

The reference's durability story is "the repo IS the database": every
cron run commits data + checkpoint to git, so history is queryable via
checkouts. Delta Lake's transaction log is the industrial form; this
module is the dependency-free equivalent the engine ships with:

- each publish writes a NEW immutable version directory, then atomically
  repoints `MANIFEST.json` (fsync + os.replace) — readers never see a
  torn table, exactly git's ref-update semantics;
- `read(version=N)` is time travel (`git checkout <rev>` ≡ reading an
  old manifest entry);
- old versions are retained until `vacuum(keep_last)` — `git gc` —
  which also reclaims orphan directories left by crashed publishes;
- a corrupt (not merely missing) manifest REFUSES to publish rather
  than silently restarting at v1 over existing data;
- a coarse lock file serializes publishers (two overlapping cron runs
  is the reference's own failure mode); true multi-writer isolation is
  what Delta's log protocol provides in production.

At 100 TB the version directory holds only NEW/CHANGED files plus a
file-list manifest (like Delta's add/remove log), not a full copy; the
full-copy form here keeps the semantics testable without bookkeeping.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession


class ConcurrentPublishError(RuntimeError):
    pass


class table_lock:
    """Context manager over the link-based publish lock, reusable by any
    writer that needs single-writer semantics on a path (merge_upsert's
    read-merge-swap uses it so two concurrent upserts can't both read
    the same base and lose one writer's rows — ADVICE r6). Raises
    ConcurrentPublishError on contention (same raise-don't-block policy
    as SnapshotStore.publish); a dead holder's lock is stolen."""

    def __init__(self, lock_path: str):
        self._lock = lock_path

    def __enter__(self) -> "table_lock":
        SnapshotStore._acquire_lock(self._lock)
        return self

    def __exit__(self, *exc) -> None:
        try:
            os.unlink(self._lock)
        except OSError:
            pass


class CorruptManifestError(RuntimeError):
    pass


class SnapshotStore:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    @property
    def _manifest_path(self) -> str:
        return os.path.join(self.root, "MANIFEST.json")

    def _manifest(self) -> dict:
        """Missing manifest → fresh store. Corrupt/unreadable manifest →
        raise: guessing here would let the next publish restart at v1 and
        overwrite real data."""
        if not os.path.exists(self._manifest_path):
            return {"current": None, "versions": []}
        try:
            with open(self._manifest_path) as fh:
                m = json.load(fh)
            if "current" not in m or "versions" not in m:
                raise CorruptManifestError(f"malformed manifest: {m!r}")
            return m
        except (OSError, json.JSONDecodeError) as exc:
            raise CorruptManifestError(
                f"unreadable manifest at {self._manifest_path}: {exc}"
            ) from exc

    def _write_manifest(self, m: dict) -> None:
        fd, tmp = tempfile.mkstemp(dir=self.root, prefix=".manifest_")
        try:
            with os.fdopen(fd, "w") as fh:
                json.dump(m, fh)
                fh.flush()
                os.fsync(fh.fileno())
            os.replace(tmp, self._manifest_path)
        except BaseException:
            try:
                os.unlink(tmp)
            except OSError:
                pass
            raise

    def _disk_versions(self) -> list[int]:
        out = []
        for name in os.listdir(self.root):
            mm = re.fullmatch(r"v(\d+)", name)
            if mm and os.path.isdir(os.path.join(self.root, name)):
                out.append(int(mm.group(1)))
        return sorted(out)

    def current_version(self) -> int | None:
        return self._manifest()["current"]

    def versions(self) -> list[int]:
        return list(self._manifest()["versions"])

    def publish(self, df: DataFrame) -> int:
        """Write df as the next version; atomically repoint the manifest.
        The next version number is derived from BOTH the manifest and the
        directories on disk, so a crashed half-publish can never be
        overwritten. A lock file serializes concurrent publishers."""
        lock = os.path.join(self.root, ".publish.lock")
        self._acquire_lock(lock)
        try:
            m = self._manifest()
            disk = self._disk_versions()
            version = max([m["current"] or 0, *disk, 0]) + 1
            vdir = os.path.join(self.root, f"v{version}")
            df.write.mode("overwrite").parquet(vdir)
            self._write_manifest(
                {"current": version, "versions": m["versions"] + [version]}
            )
            return version
        finally:
            try:
                os.unlink(lock)
            except OSError:
                pass

    @classmethod
    def _acquire_lock(cls, lock: str) -> None:
        """Acquire the publish lock race-free.

        The pid is written to a private temp file FIRST and hard-linked
        into place — link(2) is atomic and fails if the target exists
        (O_EXCL semantics), but unlike create-then-write the lock file is
        never observable in an empty state, so a concurrent publisher can
        never misread a live holder as dead. Stealing a dead holder's
        lock is serialized through an flock(2)'d sidecar
        (_steal_dead_lock): liveness is RE-verified inside that critical
        section, so a stealer can never unlink a lock another stealer
        just re-linked with a live pid — the double-acquisition
        interleaving ADVICE r5 found in the unguarded unlink. After a
        successful link we additionally verify by inode that OUR link is
        the one the path resolves to (belt-and-braces against any
        unlinker that bypasses the sidecar, e.g. an operator's manual
        `rm`).
        """
        import uuid

        tmp = f"{lock}.{os.getpid()}.{uuid.uuid4().hex}"
        with open(tmp, "w") as fh:
            fh.write(str(os.getpid()))
            fh.flush()
            os.fsync(fh.fileno())
        try:
            for attempt in range(2):  # fresh try, then one steal try
                try:
                    os.link(tmp, lock)
                except FileExistsError:
                    if attempt == 0 and cls._steal_dead_lock(lock):
                        # Holder died between data write and manifest
                        # update (SIGKILL runs no finally) — steal, so
                        # the next cron run self-heals instead of
                        # blocking on an operator (the crash-recovery
                        # half of git's ref model).
                        continue
                    raise ConcurrentPublishError(
                        f"another publish holds {lock}; remove it only if "
                        "that publisher is known dead"
                    ) from None
                # link succeeded — but a racing stealer may have unlinked
                # the path between our link and now. Holding the lock
                # means the PATH resolves to OUR inode.
                try:
                    if os.stat(lock).st_ino == os.stat(tmp).st_ino:
                        return
                except OSError:
                    pass
                raise ConcurrentPublishError(
                    f"another publish raced for {lock}"
                )
            raise ConcurrentPublishError(f"another publish raced for {lock}")
        finally:
            try:
                os.unlink(tmp)
            except OSError:
                pass

    @classmethod
    def _steal_dead_lock(cls, lock: str) -> bool:
        """Remove `lock` iff its recorded holder is dead — atomically
        with respect to other stealers. Stealers serialize on an
        flock(2)'d sidecar (kernel-released on crash, so the guard can
        never itself dangle); liveness is re-checked INSIDE the critical
        section, so the interleaving where stealer A unlinks-and-relinks
        a live lock between stealer B's check and B's unlink is
        impossible: by the time B holds the guard, the lock records A's
        live pid and B backs off. The sidecar is deliberately NEVER
        unlinked: removing it would let a later stealer open (create) a
        NEW inode at the same path and flock that instead — two holders,
        no mutual exclusion. One empty file per store is the price of
        the guarantee. Returns True iff the caller may retry its
        link."""
        import fcntl

        guard = lock + ".steal"
        with open(guard, "w") as g:
            fcntl.flock(g, fcntl.LOCK_EX)
            try:
                if cls._lock_holder_alive(lock):
                    return False  # re-linked by a faster stealer — back off
                try:
                    os.unlink(lock)
                except FileNotFoundError:
                    pass  # already gone — our link retry settles it
                except OSError:
                    return False
                return True
            finally:
                fcntl.flock(g, fcntl.LOCK_UN)

    @staticmethod
    def _lock_holder_alive(lock: str) -> bool:
        """True iff the pid recorded in the lock file is a live process.
        Unreadable/empty lock (holder died mid-write) counts as dead."""
        try:
            with open(lock) as fh:
                pid = int(fh.read().strip())
        except (OSError, ValueError):
            return False
        try:
            os.kill(pid, 0)
        except ProcessLookupError:
            return False
        except PermissionError:
            return True
        return True

    def read(self, spark: SparkSession, version: int | None = None) -> DataFrame:
        m = self._manifest()
        v = version if version is not None else m["current"]
        if v is None or v not in m["versions"]:
            raise ValueError(f"no such version {v!r}; have {m['versions']}")
        return spark.read.parquet(os.path.join(self.root, f"v{v}"))

    def vacuum(self, keep_last: int = 2) -> list[int]:
        """Drop all but the newest keep_last versions (never the current),
        plus any orphan version directories a crashed publish left behind
        (on disk but in no manifest)."""
        m = self._manifest()
        keep = {m["current"]}
        if keep_last > 0:
            keep |= set(m["versions"][-keep_last:])
        dropped = []
        for v in self._disk_versions():
            if v in keep:
                continue
            shutil.rmtree(os.path.join(self.root, f"v{v}"), ignore_errors=True)
            dropped.append(v)
        m["versions"] = [v for v in m["versions"] if v in keep]
        self._write_manifest(m)
        return dropped
