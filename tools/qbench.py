"""Isolated per-query bench: replicate bench.py's protocol (warm
session, table warm-up, one untimed warm run, median of N timed noop
runs, calibration probe) for an arbitrary subset of queries.

Usage: python tools/qbench.py name1 name2 ...  [-n RUNS]

Prints one line per query: median, samples, normalized (median /
calibration probe median). For triage only — the committed
BENCH_DETAIL.json comes from bench.py's full run.
"""

from __future__ import annotations

import argparse
import gc
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from agri_market_data_pipeline_spark import memo  # noqa: E402
from agri_market_data_pipeline_spark.registry import all_queries  # noqa: E402
from agri_market_data_pipeline_spark.session import get_spark  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("-n", type=int, default=3, help="timed runs per query")
    ap.add_argument(
        "--split",
        action="store_true",
        help="also report build (queries() call) vs execute (noop) time",
    )
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("qbench")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()

    from agri_market_data_pipeline_spark.schemas import TABLE_NAMES
    from agri_market_data_pipeline_spark.tables import load

    for t in TABLE_NAMES:
        load(spark, sf_dir, t).write.format("noop").mode("overwrite").save()

    from bench import _calib_run  # noqa: E402

    _calib_run(spark)
    calibs = [_calib_run(spark) for _ in range(3)]
    calib = statistics.median(calibs)
    print(f"calibration_sec={calib:.3f} samples={[round(c,3) for c in calibs]}")

    def job_stats() -> tuple[int, int]:
        """(job count, total task count) so far — deterministic
        counters immune to machine noise."""
        st = spark.sparkContext.statusTracker()
        jids = st.getJobIdsForGroup(None)
        tasks = 0
        for j in jids:
            ji = st.getJobInfo(j)
            if ji is None:
                continue
            for s in ji.stageIds:
                si = st.getStageInfo(s)
                if si is not None:
                    tasks += si.numTasks
        return len(jids), tasks

    for name in args.names:
        fn = queries[name]

        def one_run() -> tuple[float, float]:
            t0 = time.time()
            df = fn(spark, sf_dir)
            t1 = time.time()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.time()
            spark.catalog.clearCache()
            # bench.py's sample boundary (r13): evict data memos so
            # every sample pays its own index/state builds.
            memo.clear_all()
            gc.collect()
            return t1 - t0, t2 - t1

        j0, t0n = job_stats()
        one_run()
        j1, t1n = job_stats()
        runs = [one_run() for _ in range(args.n)]
        tot = [b + e for b, e in runs]
        med = statistics.median(tot)
        msg = (
            f"{name:40s} median={med:6.3f}  norm={med / calib:6.2f}"
            f"  jobs={j1 - j0} tasks={t1n - t0n}"
            f"  samples={[round(t, 3) for t in tot]}"
        )
        if args.split:
            msg += (
                f"  build={[round(b, 3) for b, _ in runs]}"
                f"  exec={[round(e, 3) for _, e in runs]}"
            )
        print(msg)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
