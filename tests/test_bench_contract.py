"""Driver-contract pin for bench.py: one COMPACT JSON line on stdout
(the driver captures only a ~2,000-char stdout tail — r4's full
per-query payload overflowed it and parsed as null), with the per-query
detail written to BENCH_DETAIL.json. Runs a 3-query subset at the
smallest sf with the isolated-JVM ingest stage stubbed, so the pin
costs ~1 min, not a full suite."""

from __future__ import annotations

import io
import json
import sys


def test_bench_emits_driver_contract_json(monkeypatch, tmp_path):
    import bench

    monkeypatch.setenv("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    # subset run must never clobber the committed full-run artifact
    detail_path = str(tmp_path / "BENCH_DETAIL.json")
    monkeypatch.setenv("SPARK_GRAFT_BENCH_DETAIL", detail_path)
    monkeypatch.setattr(
        bench, "HEADLINE", ["scan_parquet", "agg_price_stats", "dedup_exact"]
    )
    monkeypatch.setattr(
        bench, "_ingest_throughput_isolated", lambda: (-1.0, -1.0)
    )

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

    # … it lives in the detail file instead (routed to tmp_path here)
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


def test_benchguard_flags_regressions(tmp_path):
    """tools/benchguard.py: >1.5x a pinned normalized median fails, a
    dropped headline query fails, within-budget and new queries pass
    (VERDICT r5 item 3 — the guard that catches silent inflation)."""
    import json
    import sys

    sys.path.insert(0, "/root/repo/tools")
    try:
        import benchguard
    finally:
        sys.path.pop(0)

    base = tmp_path / "base.json"
    det = tmp_path / "det.json"

    def write(path, queries, total):
        path.write_text(
            json.dumps({"queries_normalized": queries, "normalized_total": total})
        )

    write(base, {"q1": 1.0, "q2": 2.0}, 3.0)
    # within budget + a new query: green
    write(det, {"q1": 1.4, "q2": 2.1, "q3": 9.0}, 12.5)
    assert benchguard.check(str(det), str(base)) == 0
    # one query beyond 1.5x: fail
    write(det, {"q1": 1.6, "q2": 2.0}, 3.6)
    assert benchguard.check(str(det), str(base)) == 1
    # a baselined query silently dropped: fail
    write(det, {"q1": 1.0}, 1.0)
    assert benchguard.check(str(det), str(base)) == 1

    # the committed artifacts themselves parse and are the full-run
    # shape (not a test-subset stub — ADVICE r5 medium)
    with open("/root/repo/BENCH_BASELINE.json") as f:
        b = json.load(f)
    assert len(b["queries_normalized"]) >= 50
    with open("/root/repo/BENCH_DETAIL.json") as f:
        d = json.load(f)
    assert d["n_queries"] >= 50


def test_slot_calib_absorbs_early_suite_contention():
    """Unit pin for the r11 normalization fix (VERDICT r10 item 1):
    the per-slot probe window must track a transient that inflates the
    first slots, where the run median cannot. The fixture is the
    ACTUAL r10 driver data shape — probes 0-2 at 1.03/1.16/1.29 s
    against a 0.47 s run median, which falsely breached slots 1-3."""
    import statistics

    import bench

    # r10 driver run: first probes hot, rest settled around 0.47
    cs = [1.032, 1.158, 1.287, 0.578] + [0.47] * 50 + [0.419]
    run_median = statistics.median(cs)
    assert run_median < 0.5
    # slot 0 (agg_price_stats) sits between probes 0 and 1: its local
    # calibration must reflect the hot neighborhood (>2x run median)
    assert bench.slot_calib(cs, 0) > 2 * run_median
    # retro-check with the real r10 medians: 4.054s at slot 0 breached
    # its 3.80 pin under run-median (8.59 normalized) and is green
    # under per-slot (< 3.80)
    assert 4.054 / run_median > 3.80
    assert 4.054 / bench.slot_calib(cs, 0) < 3.80
    # mid-suite slots are unaffected: local median == settled value
    assert bench.slot_calib(cs, 20) == 0.47
    # edge windows re-widen to 4 samples and never raise
    assert bench.slot_calib(cs, len(cs) - 2) > 0
    assert bench.slot_calib([0.5, 0.6], 0) == 0.55
