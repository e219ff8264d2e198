"""Snapshot store (sink_git_commit analog): versioned publication, time
travel, atomic manifest swap, vacuum."""

from __future__ import annotations

import os

from agri_market_data_pipeline_spark.sources.snapshots import SnapshotStore


def test_publish_read_time_travel_vacuum(spark, tmp_path):
    store = SnapshotStore(str(tmp_path / "store"))
    assert store.current_version() is None

    v1 = store.publish(spark.createDataFrame([(1, "a")], "id int, v string"))
    v2 = store.publish(spark.createDataFrame([(1, "a2"), (2, "b")], "id int, v string"))
    v3 = store.publish(spark.createDataFrame([(3, "c")], "id int, v string"))
    assert (v1, v2, v3) == (1, 2, 3)
    assert store.current_version() == 3

    # latest + time travel
    assert {r.v for r in store.read(spark).collect()} == {"c"}
    assert {r.v for r in store.read(spark, version=1).collect()} == {"a"}
    assert {r.v for r in store.read(spark, version=2).collect()} == {"a2", "b"}

    # vacuum keeps newest two; v1 becomes unreadable
    dropped = store.vacuum(keep_last=2)
    assert dropped == [1]
    assert store.versions() == [2, 3]
    try:
        store.read(spark, version=1)
        raise AssertionError("expected ValueError for vacuumed version")
    except ValueError:
        pass


def test_torn_manifest_never_visible(spark, tmp_path):
    """A half-written new version without the manifest swap leaves the
    old version live (the crash-safety property)."""
    store = SnapshotStore(str(tmp_path / "store"))
    store.publish(spark.createDataFrame([(1,)], "id int"))
    # simulate a crashed publish: data dir exists, manifest not repointed
    os.makedirs(str(tmp_path / "store" / "v99"), exist_ok=True)
    assert store.current_version() == 1
    assert store.read(spark).count() == 1


def test_corrupt_manifest_refuses_to_publish(spark, tmp_path):
    from agri_market_data_pipeline_spark.sources.snapshots import (
        CorruptManifestError,
    )

    store = SnapshotStore(str(tmp_path / "store"))
    store.publish(spark.createDataFrame([(1,)], "id int"))
    (tmp_path / "store" / "MANIFEST.json").write_text("{truncated")
    for op in (store.current_version, lambda: store.publish(
        spark.createDataFrame([(2,)], "id int")
    )):
        try:
            op()
            raise AssertionError("expected CorruptManifestError")
        except CorruptManifestError:
            pass
    # v1 data untouched by the refused publish
    assert spark.read.parquet(str(tmp_path / "store" / "v1")).count() == 1


def test_crashed_publish_never_clobbered_and_vacuumable(spark, tmp_path):
    store = SnapshotStore(str(tmp_path / "store"))
    store.publish(spark.createDataFrame([(1,)], "id int"))
    # crashed publish: v2 on disk, manifest still at v1
    spark.createDataFrame([(99,)], "id int").write.parquet(
        str(tmp_path / "store" / "v2")
    )
    v = store.publish(spark.createDataFrame([(3,)], "id int"))
    assert v == 3  # skipped over the orphan instead of overwriting it
    dropped = store.vacuum(keep_last=1)
    assert 2 in dropped  # orphan reclaimed
    assert store.versions() == [3]


def test_vacuum_keep_last_zero_keeps_only_current(spark, tmp_path):
    store = SnapshotStore(str(tmp_path / "store"))
    for i in range(3):
        store.publish(spark.createDataFrame([(i,)], "id int"))
    dropped = store.vacuum(keep_last=0)
    assert dropped == [1, 2]
    assert store.versions() == [3] and store.current_version() == 3


def test_publish_lock_blocks_concurrent(spark, tmp_path):
    from agri_market_data_pipeline_spark.sources.snapshots import (
        ConcurrentPublishError,
    )

    store = SnapshotStore(str(tmp_path / "store"))
    # a LIVE holder (this very process) blocks
    (tmp_path / "store" / ".publish.lock").write_text(str(os.getpid()))
    try:
        store.publish(spark.createDataFrame([(1,)], "id int"))
        raise AssertionError("expected ConcurrentPublishError")
    except ConcurrentPublishError:
        pass


def test_kill_between_write_and_manifest_recovers(spark, tmp_path):
    """The reference's at-least-once flaw (SURVEY §3.1.6): a publisher
    killed AFTER writing data but BEFORE the manifest repoint — with
    its lock file left behind, as SIGKILL leaves it. The previous
    snapshot must stay readable, and the NEXT run must self-heal:
    steal the dead lock, skip over the orphan version, publish, and
    vacuum the orphan (VERDICT r3 item 6)."""
    import subprocess
    import sys

    store = SnapshotStore(str(tmp_path / "store"))
    store.publish(spark.createDataFrame([(1,)], "id int"))

    # Simulate the kill: v2 data fully on disk, manifest NOT updated,
    # lock held by a process that no longer exists (spawn-and-reap a
    # real pid so the liveness probe sees a genuinely dead holder).
    spark.createDataFrame([(99,)], "id int").write.parquet(
        str(tmp_path / "store" / "v2")
    )
    dead = subprocess.Popen([sys.executable, "-c", "pass"])
    dead.wait()
    (tmp_path / "store" / ".publish.lock").write_text(str(dead.pid))

    # previous snapshot still readable through the manifest
    assert store.current_version() == 1
    assert [r.id for r in store.read(spark).collect()] == [1]

    # next run: steals the stale lock, never clobbers the orphan
    v = store.publish(spark.createDataFrame([(3,)], "id int"))
    assert v == 3
    assert [r.id for r in store.read(spark).collect()] == [3]
    assert not (tmp_path / "store" / ".publish.lock").exists()
    dropped = store.vacuum(keep_last=1)
    assert 2 in dropped and store.versions() == [3]


def test_steal_guard_refuses_live_lock(tmp_path):
    """ADVICE r5 interleaving: stealer B saw a dead lock, but by the
    time B reaches the unlink, stealer A has already stolen and
    re-linked a LIVE lock. Liveness is re-verified INSIDE the flock'd
    steal guard, so B backs off and A's lock is never unlinked."""
    from agri_market_data_pipeline_spark.sources.snapshots import (
        SnapshotStore,
    )

    lock = str(tmp_path / ".publish.lock")
    with open(lock, "w") as f:
        f.write(str(os.getpid()))  # a live holder (this process)
    ino = os.stat(lock).st_ino
    assert SnapshotStore._steal_dead_lock(lock) is False
    assert os.stat(lock).st_ino == ino  # untouched


def test_steal_guard_removes_dead_lock(tmp_path):
    import subprocess
    import sys

    from agri_market_data_pipeline_spark.sources.snapshots import (
        SnapshotStore,
    )

    dead = subprocess.Popen([sys.executable, "-c", "pass"])
    dead.wait()
    lock = str(tmp_path / ".publish.lock")
    with open(lock, "w") as f:
        f.write(str(dead.pid))
    assert SnapshotStore._steal_dead_lock(lock) is True
    assert not os.path.exists(lock)
    # already-gone lock (a faster stealer finished first): still True —
    # the caller's link retry settles who acquires
    assert SnapshotStore._steal_dead_lock(lock) is True
