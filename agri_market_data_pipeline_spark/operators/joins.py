"""Join operators (SURVEY.md §2.B).

The reference has zero joins (its one wide table is pre-denormalized);
these are the joins its star-schema data model exists to serve. Scale
notes per operator: broadcast for small dims, sort-merge for
large×large, and non-equi joins get an explicit cost containment story.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.exact import dsum, sql_dsum
from ..registry import query
from ..tables import load


@query(
    "join_broadcast_dim",
    oracle=f"""
SELECT r.r_name,
       COUNT(*) AS n_customers,
       {sql_dsum("c.c_acctbal")} AS sum_acctbal
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name
""",
)
def join_broadcast_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact × small-dim equi-join with explicit broadcast hints.

    nation (25 rows) and region (5 rows) ship to every executor once; the
    fact side never shuffles for the join — the only exchange left is the
    final groupBy, which AQE coalesces. This is the pattern for every
    dimension lookup at 100 TB (the reference's Commodity_Code lookup,
    SURVEY.md §2.A `join_broadcast_dim`)."""
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(F.count("*").alias("n_customers"), dsum("c_acctbal").alias("sum_acctbal"))
    )


@query(
    "join_shuffle_equi",
    oracle=f"""
SELECT o.o_orderpriority,
       COUNT(*) AS n_lines,
       {sql_dsum("l.l_extendedprice")} AS sum_price
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderpriority
""",
)
def join_shuffle_equi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large × large equi-join (lineitem × orders): both sides hash-
    partition on the join key → sort-merge join. At 100 TB the win is
    bucketing both tables on orderkey at write time (no shuffle at read);
    here we keep the declarative form and let AQE pick SMJ/shuffled-hash
    and handle skew."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_lines"), dsum("l_extendedprice").alias("sum_price"))
    )


@query(
    "join_left_semi_anti",
    oracle="""
SELECT 'with_orders' AS side, COUNT(*) AS cnt
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
UNION ALL
SELECT 'without_orders' AS side, COUNT(*) AS cnt
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
""",
)
def join_left_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Existence (left semi) and absence (left anti) checks — the Spark
    plans carry only the left side's columns and stop probing on first
    match, far cheaper than join+distinct."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").select("o_custkey")
    semi = (
        c.join(o, c.c_custkey == o.o_custkey, "leftsemi")
        .agg(F.count("*").alias("cnt"))
        .select(F.lit("with_orders").alias("side"), "cnt")
    )
    anti = (
        c.join(o, c.c_custkey == o.o_custkey, "leftanti")
        .agg(F.count("*").alias("cnt"))
        .select(F.lit("without_orders").alias("side"), "cnt")
    )
    return semi.unionByName(anti)


@query(
    "join_outer",
    oracle="""
SELECT c.c_mktsegment,
       COUNT(*) AS n_rows,
       COUNT(o.o_orderkey) AS n_orders,
       CAST(SUM(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_customers_no_orders
FROM customer c
LEFT JOIN orders o ON c.c_custkey = o.o_custkey
GROUP BY c.c_mktsegment
""",
)
def join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving unmatched customers; null-probe counts
    make outer semantics observable in the hash comparison."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    j = c.join(o, c.c_custkey == o.o_custkey, "left")
    return j.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_rows"),
        F.count("o_orderkey").alias("n_orders"),
        F.sum(F.when(F.col("o_orderkey").isNull(), 1).otherwise(0)).alias(
            "n_customers_no_orders"
        ),
    )


@query(
    "join_range_theta",
    oracle="""
SELECT s.s_suppkey,
       COUNT(*) AS n_cust_in_band
FROM supplier s
JOIN customer c
  ON c.c_acctbal BETWEEN s.s_acctbal - 1000 AND s.s_acctbal + 1000
GROUP BY s.s_suppkey
""",
)
def join_range_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi (band/theta) join: customers whose balance lies within
    ±1000 of a supplier's. Spark plans this as BroadcastNestedLoopJoin
    with the tiny side broadcast — correct here because supplier is a
    dimension. At 100 TB with two large sides you pre-bucket both sides
    into width-2000 bands, equi-join on the band id (each row joins its
    own and one neighbor band) and re-apply the exact predicate — turning
    O(n·m) into a co-partitioned equi-join."""
    s = load(spark, sf_dir, "supplier")
    c = load(spark, sf_dir, "customer")
    cond = c.c_acctbal.between(s.s_acctbal - 1000, s.s_acctbal + 1000)
    return (
        s.join(c, cond)
        .groupBy("s_suppkey")
        .agg(F.count("*").alias("n_cust_in_band"))
    )


@query(
    "join_cross",
    oracle="""
SELECT r.r_name, n.n_name,
       CASE WHEN r.r_regionkey = n.n_regionkey THEN 1 ELSE 0 END AS is_home
FROM region r CROSS JOIN nation n
""",
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit Cartesian product of two tiny dimensions (5 × 25) — the
    membership-matrix shape (every region × every nation, flagged). The
    plan is BroadcastNestedLoopJoin: correct exactly because one side is
    broadcast-small; a fact×fact cross is never legitimate at scale —
    every big-table pairing in this library goes through an equi or
    banded prefilter instead (join_range_banded, similarity blocking)."""
    r = load(spark, sf_dir, "region")
    n = load(spark, sf_dir, "nation")
    return r.crossJoin(n).select(
        "r_name",
        "n_name",
        F.when(F.col("r_regionkey") == F.col("n_regionkey"), 1)
        .otherwise(0)
        .alias("is_home"),
    )


@query(
    "join_bloom_runtime",
    oracle=f"""
SELECT l.l_returnflag,
       COUNT(*) AS n_lines,
       {sql_dsum("l.l_quantity")} AS sum_qty
FROM lineitem l
JOIN (SELECT o_orderkey FROM orders
      WHERE o_orderpriority = '1-URGENT') o
  ON l.l_orderkey = o.o_orderkey
GROUP BY l.l_returnflag
""",
)
def join_bloom_runtime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle join with a RUNTIME BLOOM FILTER (semi-join reduction):
    Catalyst's InjectRuntimeFilter plants a bloom filter built from the
    selective build side (urgent orders) as a `might_contain` predicate
    on the probe-side scan, so most non-matching lineitem rows die
    BEFORE the shuffle — at 100 TB this is the difference between
    shuffling the full fact table and shuffling the ~20% that can
    match. The hint forces a sort-merge join (broadcast would bypass
    the row-level filter); tests/test_plans.py asserts the
    bloom_filter_agg/might_contain pair is really in the plan.

    The injection thresholds are scoped: InjectRuntimeFilter reads conf
    at OPTIMIZATION time, so the function materializes the query
    execution (optimized + physical plan are cached on the returned
    DataFrame) inside the scoped block, then restores session state —
    the hostile-session rule (tests/test_hostile_session.py): no
    operator leaks config to its neighbors.
    """
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_quantity"
    )
    o = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey")
    )
    confs = {
        # probe side must look "big enough to be worth filtering";
        # local testdata is far below the 10 GB production default
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        # InjectRuntimeFilter declines when the build side is
        # broadcastable by size (a broadcast join needs no reduction);
        # at production scale the urgent-orders side IS over the
        # threshold — emulate that here so the rule fires on testdata
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    prev = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        j = (
            li.hint("merge")
            .join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("l_returnflag")
            .agg(
                F.count("*").alias("n_lines"),
                dsum("l_quantity").alias("sum_qty"),
            )
        )
        # force optimization + physical planning NOW, while the scoped
        # confs are live; both plans cache on this DataFrame's
        # QueryExecution, so the later action reuses them
        j._jdf.queryExecution().executedPlan()
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    return j


@query(
    "join_null_safe",
    oracle="""
WITH s1 AS (
  SELECT NULLIF(event_type, 'click') AS k, COUNT(*) AS c1
  FROM events GROUP BY 1
),
s2 AS (
  SELECT NULLIF(event_type, 'view') AS k, COUNT(*) AS c2
  FROM events GROUP BY 1
)
SELECT s1.k AS k1, s2.k AS k2, s1.c1, s2.c2
FROM s1 JOIN s2 ON s1.k IS NOT DISTINCT FROM s2.k
""",
)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (`<=>` ↔ IS NOT DISTINCT FROM): the two
    sides NULL out a different key value, and the null-safe predicate
    matches the NULL rows with each other — where plain `=` silently
    drops every NULL key, the classic lost-rows bug when late/unknown
    dimension keys are encoded as NULL. Catalyst plans `<=>` as a
    hash join (EqualNullSafe is still an equi-key), NOT a nested
    loop — null keys hash to one bucket, so at scale heavy NULL
    populations are a skew consideration (join_skew_salted's
    treatment applies)."""
    ev = load(spark, sf_dir, "events")
    s1 = ev.groupBy(
        F.nullif("event_type", F.lit("click")).alias("k1")
    ).agg(F.count("*").alias("c1"))
    s2 = ev.groupBy(
        F.nullif("event_type", F.lit("view")).alias("k2")
    ).agg(F.count("*").alias("c2"))
    return s1.join(s2, s1.k1.eqNullSafe(s2.k2)).select("k1", "k2", "c1", "c2")
