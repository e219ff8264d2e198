"""Set operations (SURVEY.md §2.B: set_union_all, set_intersect_except).

set_union_all mirrors the reference's *read path*: its 292 per-commodity
CSV partitions are implicitly UNION ALLed by any cross-commodity query
(SURVEY.md §3, entry point 3)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.exact import dsum, sql_dsum
from ..registry import query
from ..tables import load


@query(
    "set_union_all",
    oracle=f"""
SELECT o_orderstatus,
       COUNT(*) AS cnt,
       {sql_dsum("o_totalprice")} AS sum_price
FROM (
    SELECT * FROM orders WHERE o_orderstatus = 'F'
    UNION ALL
    SELECT * FROM orders WHERE o_totalprice > 200000
) u
GROUP BY o_orderstatus
""",
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL of two (overlapping) slices — bag semantics preserved, so
    rows in both slices count twice. `unionByName` aligns by column name,
    the safe form when branch schemas evolve independently (as the
    reference's per-commodity files could)."""
    o = load(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "F")
    b = o.filter(F.col("o_totalprice") > 200000)
    return (
        a.unionByName(b)
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("cnt"), dsum("o_totalprice").alias("sum_price"))
    )


@query(
    "set_intersect_except",
    oracle="""
SELECT 'both' AS side, n_nationkey
FROM (SELECT n_nationkey FROM nation JOIN customer ON c_nationkey = n_nationkey
      INTERSECT
      SELECT n_nationkey FROM nation JOIN supplier ON s_nationkey = n_nationkey) t
UNION ALL
SELECT 'customer_only' AS side, n_nationkey
FROM (SELECT n_nationkey FROM nation JOIN customer ON c_nationkey = n_nationkey
      EXCEPT
      SELECT n_nationkey FROM nation JOIN supplier ON s_nationkey = n_nationkey) t
""",
)
def set_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT (distinct set semantics, matching SQL): nations
    that have both customers and suppliers vs. customer-only nations —
    the 'markets trading A but not B' shape."""
    n = load(spark, sf_dir, "nation")
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    cust_nations = n.join(c, c.c_nationkey == n.n_nationkey).select("n_nationkey")
    supp_nations = n.join(s, s.s_nationkey == n.n_nationkey).select("n_nationkey")
    both = cust_nations.intersect(supp_nations).select(
        F.lit("both").alias("side"), "n_nationkey"
    )
    # subtract == SQL EXCEPT (distinct semantics); exceptAll would keep bag
    # multiplicities, which is not what the oracle's EXCEPT computes.
    cust_only = cust_nations.subtract(supp_nations).select(
        F.lit("customer_only").alias("side"), "n_nationkey"
    )
    return both.unionByName(cust_only)


@query(
    "set_union_distinct",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 9000
UNION
SELECT s_nationkey AS nationkey FROM supplier
""",
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) — nations having either a rich customer or any
    supplier, each once. Planned as union-all + hash-dedup with
    map-side partial dedup, so the shuffle carries distinct keys per
    partition, not raw rows — at 100 TB the exchange is bounded by key
    cardinality. `set_union_all` is the bag twin."""
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    return (
        c.filter(F.col("c_acctbal") > 9000)
        .select(F.col("c_nationkey").alias("nationkey"))
        .union(s.select(F.col("s_nationkey").alias("nationkey")))
        .distinct()
    )
