"""Driver-contract pin for bench.py: one JSON line on stdout with the
agreed fields. Runs a 3-query subset at the smallest sf with the
isolated-JVM ingest stage stubbed, so the pin costs ~1 min, not a full
suite."""

from __future__ import annotations

import io
import json
import sys


def test_bench_emits_driver_contract_json(monkeypatch):
    import bench

    monkeypatch.setenv("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    monkeypatch.setattr(
        bench, "HEADLINE", ["scan_parquet", "agg_price_stats", "dedup_exact"]
    )
    monkeypatch.setattr(bench, "_ingest_throughput_isolated", lambda: -1.0)

    cap = io.StringIO()
    old = sys.stdout
    sys.stdout = cap
    try:
        rc = bench.main()
    finally:
        sys.stdout = old
    assert rc == 0
    d = json.loads(cap.getvalue().strip().splitlines()[-1])

    # driver contract: one JSON object, these fields, these shapes
    assert d["metric"] == "headline_queries_total_runtime"
    assert d["unit"] == "sec" and d["value"] > 0
    assert d["sf"] == 0.001
    assert set(d["queries"]) == {"scan_parquet", "agg_price_stats", "dedup_exact"}
    assert all(v > 0 for v in d["queries"].values())
    # round-over-round comparability additions (r4): same-run calibration
    assert d["calibration_sec"] > 0
    assert len(d["calibration_samples"]) == len(d["queries"]) + 1
    assert set(d["queries_normalized"]) == set(d["queries"])
    assert abs(d["normalized_total"] - sum(d["queries_normalized"].values())) < 0.1
