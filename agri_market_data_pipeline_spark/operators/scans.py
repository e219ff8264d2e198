"""Scan operators (SURVEY.md §2.B: scan_parquet, scan_jsonl; scan_csv in
csv_compat.py because it needs a materialized CSV mirror).

The reference's only scan is a paginated REST source (fetch_data.py:64-114)
plus implicit per-commodity CSV reads (SURVEY.md §3 entry point 3). Here
scans are declarative reads where Catalyst pushes filters and prunes
columns down to the parquet footer — `.explain` shows PushedFilters and a
pruned ReadSchema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.exact import dsum, sql_dsum
from ..registry import query
from ..tables import load, load_parallel


@query(
    "scan_parquet",
    oracle="""
SELECT l_returnflag,
       COUNT(*) AS cnt,
       CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS sum_qty
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '2000-01-01'
GROUP BY l_returnflag
""",
)
def scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Columnar scan with predicate + projection pushdown.

    The WHERE on l_shipdate reaches the parquet scan as a PushedFilter and
    ReadSchema carries only the 3 referenced columns — at 100 TB this is
    the difference between scanning the table and scanning ~3 columns of
    the matching row groups.
    """
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") >= F.lit("2000-01-01").cast("timestamp"))
        .groupBy("l_returnflag")
        .agg(F.count("*").alias("cnt"), dsum("l_quantity").alias("sum_qty"))
    )


@query(
    "scan_jsonl",
    oracle=f"""
SELECT event_type,
       COUNT(*) AS cnt,
       {sql_dsum("CAST(json_extract_string(props, '$.k') AS INT)")} AS sum_k
FROM events
GROUP BY event_type
""",
)
def scan_jsonl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested-JSON field access (`events.props` is a JSON string column,
    the stand-in for the reference API's raw JSON records,
    fetch_data.py:80). `get_json_object` stays JVM-side (codegen'd), no
    Python round trip."""
    ev = load_parallel(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("int")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(F.count("*").alias("cnt"), dsum("k").alias("sum_k"))
    )
