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
