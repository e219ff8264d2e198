"""Sort / limit / top-k operators (SURVEY.md §2.B)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load


@query(
    "sort_order_by",
    oracle="""
SELECT o_orderkey, o_totalprice, o_orderdate
FROM orders
WHERE o_totalprice > 300000
ORDER BY o_totalprice DESC, o_orderkey
""",
)
def sort_order_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global sort: range-partitioned exchange (sampled split points) then
    per-partition sort — no single-node bottleneck. o_orderkey breaks
    price ties so the order is total (the driver's hash is order-
    insensitive, but the operator's contract is a deterministic order)."""
    o = load(spark, sf_dir, "orders")
    return (
        o.filter(F.col("o_totalprice") > 300000)
        .select("o_orderkey", "o_totalprice", "o_orderdate")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    )


@query(
    "limit_topk",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
""",
)
def limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k without a global sort: Spark plans orderBy().limit(k) as
    TakeOrderedAndProject — each partition keeps its local top-k heap and
    the driver merges k·p rows, never materializing a full sort. This is
    THE top-k pattern at 100 TB (cf. SURVEY.md §2.B limit_topk,
    EDBT'20 incremental top-k for the streaming variant)."""
    o = load(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )
