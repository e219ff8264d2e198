"""Storage-layout operators: the write-time scale upgrades must be
physically real — pruned scans list one directory, bucketed joins plan
no exchange, compaction actually collapses file counts while keeping
key clustering. Content equivalence is the DuckDB oracle's job; these
tests pin the physical properties an oracle can't see."""

from __future__ import annotations

import glob
import os
import re

from pyspark.sql import functions as F

from agri_market_data_pipeline_spark.plans.audit import explain_str
from agri_market_data_pipeline_spark.operators.storage_layout import (
    compacted_dataset,
    join_bucketed,
    partitioned_mirror,
    scan_partition_pruned,
    sink_compact_files,
)


def test_partition_pruning_is_in_the_plan(spark, sf_dir):
    df = scan_partition_pruned(spark, sf_dir)
    txt = explain_str(df)
    # The partition-key predicate resolves against directory metadata,
    # not row-level filtering of a full scan.
    assert re.search(r"PartitionFilters: \[[^\]]*l_returnflag[^\]]*R", txt), txt[:2000]
    # And the files actually opened at runtime are only R's directory
    # (inputFiles() reports the whole relation pre-pruning, so ask the
    # executed scan itself which files it touched).
    mirror = partitioned_mirror(spark, sf_dir)
    pruned_files = {
        r.f
        for r in spark.read.parquet(mirror)
        .filter(F.col("l_returnflag") == "R")
        .select(F.input_file_name().alias("f"))
        .distinct()
        .collect()
    }
    all_files = set(spark.read.parquet(mirror).inputFiles())
    assert pruned_files and pruned_files < all_files
    assert all("l_returnflag=R" in f for f in pruned_files)


def test_bucketed_join_query_plans_no_exchange(spark, sf_dir):
    before = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    df = join_bucketed(spark, sf_dir)
    # Hostile-session rule: the scoped broadcast conf was restored.
    assert spark.conf.get("spark.sql.autoBroadcastJoinThreshold") == before
    txt = explain_str(df)
    assert "Bucketed: true" in txt, txt[:2000]
    assert not re.search(r"Exchange hashpartitioning\(l_orderkey", txt), txt[:2000]
    assert not re.search(r"Exchange hashpartitioning\(o_orderkey", txt), txt[:2000]


def test_compaction_collapses_files_and_keeps_clustering(spark, sf_dir):
    sink_compact_files(spark, sf_dir)  # triggers materialization
    frag, comp = compacted_dataset(spark, sf_dir)
    n_frag = len(glob.glob(os.path.join(frag, "part-*")))
    n_comp = len(glob.glob(os.path.join(comp, "part-*")))
    assert n_frag == 64
    assert n_comp < n_frag
    # Range-partitioned compaction keeps files key-clustered: per-file
    # orderkey ranges must not overlap (this is what preserves row-group
    # min/max selectivity after the rewrite).
    spans = []
    for f in glob.glob(os.path.join(comp, "part-*")):
        r = spark.read.parquet(f).agg(
            F.min("l_orderkey").alias("lo"), F.max("l_orderkey").alias("hi")
        ).collect()[0]
        spans.append((r.lo, r.hi))
    spans.sort()
    for (_, hi_prev), (lo_next, _) in zip(spans, spans[1:]):
        assert hi_prev <= lo_next, spans


def test_zorder_cells_bound_both_dimensions(spark, sf_dir):
    """The point of the z-curve: every top-6-bit z-cell fixes the top 3
    bits of BOTH quantized keys, so each cell's (qa, qb) rectangle is
    at most 32x32 — the two-sided row-group-pruning guarantee hive
    partitioning on one column cannot give."""
    from agri_market_data_pipeline_spark.operators.storage_layout import (
        sink_zorder_cluster,
    )

    rows = sink_zorder_cluster(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.qa_max - r.qa_min <= 31, r
        assert r.qb_max - r.qb_min <= 31, r


def test_dynamic_partition_pruning_is_in_the_plan(spark, sf_dir):
    from agri_market_data_pipeline_spark.operators.storage_layout import (
        scan_dpp_pruned,
    )

    df = scan_dpp_pruned(spark, sf_dir)
    txt = df._jdf.queryExecution().executedPlan().toString()
    # The joined dim's key set becomes a runtime partition filter on the
    # fact scan — no literal partition predicate exists in the query.
    assert "dynamicpruning" in txt.lower(), txt[:2000]


def test_manifest_skipping_reads_fewer_files_same_answer(spark, sf_dir):
    from agri_market_data_pipeline_spark.operators.storage_layout import (
        _MAN_HI,
        _MAN_LO,
        manifest_dataset,
        scan_manifest_skipped,
    )

    data, man = manifest_dataset(spark, sf_dir)
    n_total = spark.read.parquet(man).count()
    n_kept = (
        spark.read.parquet(man)
        .filter(~((F.col("k_max") < _MAN_LO) | (F.col("k_min") > _MAN_HI)))
        .count()
    )
    # Range clustering must make the manifest selective for a ~25% range.
    assert n_kept < n_total, (n_kept, n_total)

    fast = scan_manifest_skipped(spark, sf_dir).collect()[0]
    full = (
        spark.read.parquet(data)
        .filter(F.col("l_orderkey").between(_MAN_LO, _MAN_HI))
        .agg(
            F.count("*").alias("cnt"),
            F.sum("l_extendedprice").alias("sp"),
        )
        .collect()[0]
    )
    assert fast.cnt == full.cnt and fast.cnt > 0


def test_rowgroup_stats_match_duckdb_footer(spark, sf_dir):
    """The per-row-group detail grain can't ride the gate's static
    oracle strings (parquet_metadata() needs a literal file path), so
    the cross-engine check lives here: pyarrow's footer read and
    DuckDB's parquet_metadata() must agree row-group-for-row-group on
    counts, min/max, and null counts — the same physical bytes, two
    independent readers. The registered scan_rowgroup_stats query is
    the oracle-checked contract REDUCTION of this frame (r8), asserted
    below to be exactly that reduction."""
    import duckdb

    from agri_market_data_pipeline_spark.operators.storage_layout import (
        rgs_duckdb_sql,
        rowgroup_stats_detail,
        scan_rowgroup_stats,
    )

    got = {
        r.row_group_id: (r.n_rows, r.min_price, r.max_price, r.n_nulls)
        for r in rowgroup_stats_detail(spark, sf_dir).collect()
    }
    want = {
        int(rg): (int(n), float(lo), float(hi), int(nn))
        for rg, n, lo, hi, nn in duckdb.sql(rgs_duckdb_sql(sf_dir)).fetchall()
    }
    assert got == want and len(got) >= 1

    (c,) = scan_rowgroup_stats(spark, sf_dir).collect()
    assert c.n_rows == sum(v[0] for v in got.values())
    assert c.min_price == min(v[1] for v in got.values())
    assert c.max_price == max(v[2] for v in got.values())
    assert c.n_nulls == sum(v[3] for v in got.values())
    assert c.all_min_le_max == 1 and c.all_groups_nonempty == 1
