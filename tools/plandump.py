"""Dump `.explain("formatted")` for named queries to plans/<tag>/.

Usage: python tools/plandump.py --tag r12 --suffix before name1 name2 ...
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from agri_market_data_pipeline_spark.plans.audit import explain_str  # noqa: E402
from agri_market_data_pipeline_spark.registry import all_queries  # noqa: E402
from agri_market_data_pipeline_spark.session import get_spark  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--tag", default="r12")
    ap.add_argument("--suffix", required=True, choices=["before", "after"])
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("plandump")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        args.tag,
    )
    os.makedirs(out_dir, exist_ok=True)
    for name in args.names:
        df = queries[name](spark, sf_dir)
        path = os.path.join(out_dir, f"{name}_{args.suffix}.txt")
        with open(path, "w") as f:
            f.write(explain_str(df, "formatted"))
        print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
