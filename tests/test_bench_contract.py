"""Driver-contract pin for bench.py: one COMPACT JSON line on stdout
(the driver captures only a ~2,000-char stdout tail — r4's full
per-query payload overflowed it and parsed as null), with the per-query
detail written to BENCH_DETAIL.json. Runs a 3-query subset at the
smallest sf with the isolated-JVM ingest stage stubbed, so the pin
costs ~1 min, not a full suite."""

from __future__ import annotations

import io
import json
import os
import sys


def test_bench_emits_driver_contract_json(monkeypatch, tmp_path):
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
    line = cap.getvalue().strip().splitlines()[-1]

    # THE driver gate: the final stdout line must fit the driver's
    # capture window with ample margin. The line carries only
    # count-independent scalar fields, so this bound holds for the full
    # 50+-query headline run too, not just this 3-query subset.
    assert len(line) < 1500, len(line)

    d = json.loads(line)
    # driver contract: one JSON object, these fields, these shapes
    assert d["metric"] == "headline_queries_total_runtime"
    assert d["unit"] == "sec" and d["value"] > 0
    assert d["sf"] == 0.001
    assert d["n_queries"] == 3
    assert d["calibration_sec"] > 0
    assert d["normalized_total"] > 0
    # per-query payload must NOT be on the stdout line (size) …
    assert "queries" not in d and "calibration_samples" not in d
    # every value on the line is a scalar — nothing that grows with the
    # headline count can creep back in
    assert all(not isinstance(v, (dict, list)) for v in d.values())

    # … it lives in BENCH_DETAIL.json instead
    detail_path = os.path.join(os.path.dirname(bench.__file__), "BENCH_DETAIL.json")
    with open(detail_path) as f:
        detail = json.load(f)
    assert set(detail["queries"]) == {
        "scan_parquet",
        "agg_price_stats",
        "dedup_exact",
    }
    assert all(v > 0 for v in detail["queries"].values())
    assert len(detail["calibration_samples"]) == len(detail["queries"]) + 1
    assert set(detail["queries_normalized"]) == set(detail["queries"])
    assert (
        abs(detail["normalized_total"] - sum(detail["queries_normalized"].values()))
        < 0.1
    )
    assert detail["value"] == d["value"]
    assert detail["calibration_sec"] == d["calibration_sec"]
