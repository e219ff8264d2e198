"""End-to-end RAG indexing job (jobs/rag_pipeline.py): recall against
the brute-force twin, physical partition pruning at serve time, and
determinism — the properties the per-operator oracles can't see
because the job chains them through a written index."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from agri_market_data_pipeline_spark.jobs import rag_pipeline as rp


def test_rag_pipeline_end_to_end(spark, sf_dir, tmp_path):
    out = str(tmp_path / "rag")
    os.makedirs(out, exist_ok=True)
    report = rp.run(spark, sf_dir, out)

    # Build sanity: every doc produced >= 1 chunk, the quantizer kept
    # all cells populated enough to exist.
    assert report["n_chunks"] > 0
    assert 1 <= report["n_cells"] <= rp.N_CELLS

    # The acceptance probe: with nprobe=3 of 8 cells the true top-k must
    # be substantially recovered (the query is an indexed chunk, so its
    # own cell is always probed).
    assert report["recall_at_k"] >= 0.7, report

    # The index is physically cell-partitioned: one directory per cell.
    dirs = glob.glob(os.path.join(out, "index", "cell_id=*"))
    assert len(dirs) == report["n_cells"]

    # No zero vectors survived embedding (they would NaN every cosine).
    idx = spark.read.parquet(os.path.join(out, "index"))
    n_zero = idx.filter(
        F.aggregate("embedding", F.lit(0.0), lambda s, x: s + x * x) == 0
    ).count()
    assert n_zero == 0


def test_rag_serve_prunes_partitions_and_is_deterministic(spark, sf_dir, tmp_path):
    out = str(tmp_path / "rag2")
    os.makedirs(out, exist_ok=True)
    rp.build_index(spark, sf_dir, out)
    qtext = (
        spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        .orderBy("doc_id")
        .select(F.substring("text", 1, rp.CHUNK_SIZE).alias("t"))
        .head()
        .t
    )
    served = rp.serve_query(spark, out, qtext)
    # Partition pruning is in the executed plan: the cell_id filter must
    # resolve against partition directories, not row-level data filters.
    plan = served._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell_id" in plan, plan[:2000]

    a = [(r.chunk_id, round(r.cos_sim, 9)) for r in served.collect()]
    b = [
        (r.chunk_id, round(r.cos_sim, 9))
        for r in rp.serve_query(spark, out, qtext).collect()
    ]
    assert a == b and len(a) == rp.TOP_K


def test_corpus_refresh_cycle(spark, sf_dir, tmp_path):
    """One refresh cycle: counts reconcile monotonically
    (batch >= fresh >= deduped >= accepted), the published snapshot
    holds exactly the accepted rows, a second cycle publishes a new
    version without disturbing the first (time travel), and no
    accepted doc duplicates a corpus doc's content (the dedup
    guarantee end-to-end)."""
    from agri_market_data_pipeline_spark.jobs.corpus_refresh import (
        _MOD,
        _REM,
        refresh,
    )
    from agri_market_data_pipeline_spark.sources.snapshots import SnapshotStore
    from agri_market_data_pipeline_spark.tables import load

    store_dir = str(tmp_path / "store")
    r1 = refresh(spark, sf_dir, store_dir)
    assert r1["n_batch"] >= r1["n_fresh"] >= r1["n_deduped"] >= r1["n_accepted"]
    assert r1["n_accepted"] > 0

    store = SnapshotStore(store_dir)
    snap = store.read(spark)
    assert snap.count() == r1["n_accepted"]

    # end-to-end dedup guarantee: accepted content never collides with
    # the corpus partition's content hashes
    d = load(spark, sf_dir, "documents")
    corpus_h = {
        r.h
        for r in d.filter(F.col("doc_id") % _MOD != _REM)
        .select(F.md5("text").alias("h"))
        .distinct()
        .collect()
    }
    acc_h = [r.h for r in snap.select(F.md5("text").alias("h")).collect()]
    assert not (set(acc_h) & corpus_h)

    r2 = refresh(spark, sf_dir, store_dir)
    assert r2["snapshot_version"] == r1["snapshot_version"] + 1
    assert store.read(spark, version=r1["snapshot_version"]).count() == r1[
        "n_accepted"
    ]
