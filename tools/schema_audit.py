"""Audit every registered query's output schema for driver hazards.

The driver's canonicalizer converts each result to pandas and sorts it;
array/map/struct cells arrive as numpy arrays / dicts and crash
``sort_values`` with ``TypeError: unhashable type``.  This tool builds
each query's DataFrame (plan only — nothing is executed) at the given
sf dir and flags any output column whose type is not atomic.  Run:

    python tools/schema_audit.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql.types import ArrayType, MapType, StructType  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from agri_market_data_pipeline_spark.session import get_spark  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("schema-audit")
    bad = []
    for name, fn in sorted(entrymod.queries().items()):
        try:
            df = fn(spark, sf_dir)
        except Exception as e:  # noqa: BLE001 — report, keep auditing
            bad.append((name, f"<plan build failed: {e!r:.120}>"))
            continue
        for f in df.schema.fields:
            if isinstance(f.dataType, (ArrayType, MapType, StructType)):
                bad.append((name, f"{f.name}: {f.dataType.simpleString()}"))
    if bad:
        for name, msg in bad:
            print(f"HAZARD {name}  {msg}")
        print(f"{len(bad)} hazard(s)")
        return 1
    print("no non-atomic output columns")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
