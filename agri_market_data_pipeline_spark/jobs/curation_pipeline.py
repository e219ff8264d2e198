"""End-to-end training-data curation job — the engine's LLM-pipeline
operators chained into the standard corpus-curation DAG:

1. quality gate      — length/structure scoring, drop the junk tail
                       (text_quality_score's metrics, inline)
2. exact dedup       — md5 keep-lowest (dedup_exact)
3. near-dup dedup    — MinHash/LSH clustering, keep one doc per
                       component (dedup_cluster machinery)
4. weighted sample   — Efraimidis–Spirakis A-Res by token count
                       (sample_weighted_k's key), emitting a bounded
                       training slice
5. partitioned write — language-partitioned parquet + a JSON run report

Every stage is a declarative DataFrame transform (the shuffles are the
stages' group-bys and the LSH band join — nothing driver-side except the
component loop), so the same job runs unchanged on a cluster; each
stage's surviving-row count lands in the report for curation audit.

    python -m agri_market_data_pipeline_spark.jobs.curation_pipeline \\
        /tmp/curated [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import (
    CUR_MAX_WORD_LEN,
    CUR_MIN_TOKENS,
    _connected_components,
    dedup_near_minhash_pairs,
)
from ..tables import load_parallel


def curate(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    *,
    min_tokens: int = CUR_MIN_TOKENS,
    max_word_len: float = CUR_MAX_WORD_LEN,
    sample_k: int = 200,
) -> dict:
    """Run the curation DAG; returns the per-stage audit report."""
    d = load_parallel(spark, sf_dir, "documents")
    n_raw = d.count()

    # 1. quality gate (row-local metrics, no shuffle)
    toks = F.split(F.col("text"), " ")
    n_tok = F.size(toks)
    avg_word = F.length("text") / F.greatest(n_tok, F.lit(1))
    gated = d.filter((n_tok >= min_tokens) & (avg_word <= max_word_len))
    n_gated = gated.count()

    # 2. exact dedup: keep the lowest doc_id per content hash
    keep_exact = gated.groupBy(F.md5("text").alias("h")).agg(
        F.min("doc_id").alias("doc_id")
    )
    exact = gated.join(keep_exact, "doc_id", "leftsemi")
    n_exact = exact.count()

    # 3. near-dup clustering over LSH candidate pairs; drop everything
    # but each component's representative. The representative must be
    # chosen among the docs that SURVIVED stages 1-2 — the global
    # min-doc_id label may already be gone, and dropping relative to it
    # would silently erase whole clusters.
    pairs = dedup_near_minhash_pairs(spark, sf_dir)
    labels = _connected_components(pairs, "doc_a", "doc_b")
    surv = labels.withColumnRenamed("node", "doc_id").join(
        exact.select("doc_id"), "doc_id", "leftsemi"
    )
    rep = surv.groupBy("label").agg(F.min("doc_id").alias("rep_id"))
    drop = (
        surv.join(rep, "label")
        .filter(F.col("doc_id") != F.col("rep_id"))
        .select("doc_id")
    )
    unique = exact.join(drop, "doc_id", "leftanti")
    n_unique = unique.count()
    # Audit counts: every surviving cluster must keep exactly one
    # representative, so members - clusters == docs dropped here.
    n_near_members = surv.count()
    n_near_clusters = rep.count()

    # 4. weighted sample (A-Res, md5-derived u — reproducible anywhere)
    h = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
    ).cast("long")
    wkey = F.round(
        F.log((h + 1) / F.lit(4294967296.0)) / F.greatest(n_tok.cast("long"), F.lit(1)),
        6,
    )
    sampled = (
        unique.withColumn("wkey", wkey)
        .orderBy(F.desc("wkey"), F.asc("doc_id"))
        .limit(sample_k)
        .drop("wkey")
    )

    # 5. language-partitioned publication
    out_path = os.path.join(out_dir, "corpus")
    sampled.write.mode("overwrite").partitionBy("lang").parquet(out_path)
    n_out = spark.read.parquet(out_path).count()

    report = {
        "raw": n_raw,
        "after_quality_gate": n_gated,
        "after_exact_dedup": n_exact,
        "after_near_dedup": n_unique,
        "near_members_surviving": n_near_members,
        "near_clusters_surviving": n_near_clusters,
        "sampled": n_out,
        "out": out_path,
    }
    with open(os.path.join(out_dir, "report.json"), "w") as fh:
        json.dump(report, fh, indent=2)
    return report


def main() -> int:
    from ..session import get_spark

    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/curated"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("curation-pipeline")
    spark.sparkContext.setLogLevel("ERROR")
    report = curate(spark, sf_dir, out_dir)
    for k, v in report.items():
        print(f"{k}: {v}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
