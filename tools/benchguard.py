"""Per-query bench regression guard (VERDICT r5 item 3).

Compares a bench detail file (BENCH_DETAIL.json, written by bench.py)
against the committed per-query baseline BENCH_BASELINE.json. Both
sides are CALIBRATION-NORMALIZED medians (seconds divided by the same
run's synthetic-probe median), so machine drift between the runs is
already divided out — a ratio > THRESHOLD is plan regression, not
neighborhood noise. This is the guard that would have caught r5's
silent +16% inflation automatically.

Usage:
    python tools/benchguard.py [detail.json] [baseline.json]

Exit 0: every baselined query within its threshold of the pinned
median — the uniform 1.5x default, or the per-query override in the
baseline's "thresholds" map for queries whose measured identical-code
spread exceeds 1.5x (scan_csv, udf_scalar_pandas, sim_search_ivfpq, …:
Python-worker/scan-startup-sensitive queries swing ~2x under machine
co-tenancy that the pure-CPU calibration probe does not absorb —
VERDICT r6 item 1: a guard that cries wolf on noise gets ignored the
round it matters, so noise-prone queries carry variance-sized
thresholds while stable queries keep the tight one).
Exit 1: regressions listed on stdout.
Queries present in the detail but not the baseline are reported as
"new" (not failures); queries in the baseline but missing from the
detail are reported as "gone" (failure — a silently dropped headline
query is itself a regression).
"""

from __future__ import annotations

import json
import os
import sys

THRESHOLD = 1.5

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def check(detail_path: str, baseline_path: str) -> int:
    with open(detail_path) as f:
        detail = json.load(f)
    with open(baseline_path) as f:
        baseline = json.load(f)
    base: dict[str, float] = baseline["queries_normalized"]
    cur: dict[str, float] = detail["queries_normalized"]
    thresholds: dict[str, float] = baseline.get("thresholds", {})

    # Raw per-run samples (VERDICT r7 item 8): a breach line carries its
    # own normalized noise spread so the green/red call is
    # self-explaining — a spread that straddles the pin says "rerun",
    # a spread entirely above it says "real regression".
    samples: dict[str, list[float]] = detail.get("queries_samples", {})
    cal = detail.get("calibration_sec") or 0.0

    def spread(name: str) -> str:
        ss = samples.get(name)
        if not ss or not cal:
            return ""
        lo, hi = min(ss) / cal, max(ss) / cal
        return f"  samples n={len(ss)} normalized [{lo:.3f}, {hi:.3f}]"

    regressed: list[str] = []
    gone = sorted(set(base) - set(cur))
    new = sorted(set(cur) - set(base))
    for name in sorted(set(base) & set(cur)):
        ratio = cur[name] / base[name] if base[name] > 0 else float("inf")
        limit = thresholds.get(name, THRESHOLD)
        flag = ""
        if ratio > limit:
            regressed.append(name)
            flag = f"  REGRESSED (> {limit}x){spread(name)}"
        elif limit != THRESHOLD:
            flag = f"  [noise-band limit {limit}x]"
        print(f"{name:40s} {base[name]:8.3f} -> {cur[name]:8.3f}  {ratio:5.2f}x{flag}")
    for name in new:
        print(f"{name:40s} {'(new)':>8s} -> {cur[name]:8.3f}")
    for name in gone:
        print(f"{name:40s} {base[name]:8.3f} -> GONE  (dropped from headline set)")

    tot_b = baseline.get("normalized_total")
    tot_c = detail.get("normalized_total")
    if tot_b and tot_c:
        print(f"\nnormalized_total {tot_b:.1f} -> {tot_c:.1f} ({tot_c / tot_b:.2f}x)")
    if regressed or gone:
        print(f"\nFAIL: {len(regressed)} regressed, {len(gone)} gone")
        return 1
    print("\nall queries within budget")
    return 0


def main(argv: list[str]) -> int:
    detail = argv[1] if len(argv) > 1 else os.path.join(REPO, "BENCH_DETAIL.json")
    baseline = (
        argv[2] if len(argv) > 2 else os.path.join(REPO, "BENCH_BASELINE.json")
    )
    return check(detail, baseline)


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
