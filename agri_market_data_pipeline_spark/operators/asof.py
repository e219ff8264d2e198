"""As-of and interval joins (SURVEY.md §2.B join_asof_prices,
join_interval_events).

Spark has no native AS OF join; the scalable formulation is the
union-and-carry-forward pattern: union the build (index) rows and probe
rows, sort within the join key by (time, side), and carry the last
non-null build value forward with last(..., ignorenulls) — one shuffle,
no per-row point lookups, no nested-loop blowup. DuckDB *does* have a
native ASOF JOIN, which is the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.exact import davg, sql_davg
from ..registry import query
from ..tables import load


@query(
    "join_asof_prices",
    oracle=f"""
WITH idx AS (
    SELECT o_orderpriority AS prio,
           CAST(o_orderdate AS DATE) AS d,
           {sql_davg("o_totalprice")} AS idx_val
    FROM orders
    GROUP BY 1, 2
),
probe AS (
    SELECT l.l_orderkey, l.l_linenumber,
           o.o_orderpriority AS prio,
           CAST(l.l_shipdate AS DATE) AS sd
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
)
SELECT p.l_orderkey, p.l_linenumber, p.sd,
       i.d AS idx_date, i.idx_val
FROM probe p
ASOF JOIN idx i ON p.prio = i.prio AND p.sd >= i.d
""",
)
def join_asof_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each shipment looks up the latest daily order-price
    index at or before its ship date (per priority class) — the 'latest
    quote ≤ date per market×commodity' query of SURVEY.md §2.B.

    Implementation: union-and-carry-forward. Build rows (daily index)
    and probe rows (shipments) are unioned; within each key, ordered by
    (date, side) with build first on equal dates (inclusive as-of); the
    last non-null index value is carried forward to every probe row.
    One exchange on the join key — at 100 TB with a low-cardinality key
    you additionally range-partition each key's timeline and carry the
    per-chunk boundary value, keeping partitions bounded."""
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")

    idx = (
        o.groupBy(
            F.col("o_orderpriority").alias("prio"),
            F.col("o_orderdate").cast("date").alias("d"),
        )
        .agg(davg("o_totalprice").alias("idx_val"))
    )
    probe = (
        li.join(o.select("o_orderkey", "o_orderpriority"), li.l_orderkey == o.o_orderkey)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.col("o_orderpriority").alias("prio"),
            F.col("l_shipdate").cast("date").alias("sd"),
        )
    )

    build_side = idx.select(
        "prio",
        F.col("d").alias("t"),
        F.lit(0).alias("is_probe"),
        F.lit(None).cast("long").alias("l_orderkey"),
        F.lit(None).cast("int").alias("l_linenumber"),
        F.col("d").alias("idx_date"),
        "idx_val",
    )
    probe_side = probe.select(
        "prio",
        F.col("sd").alias("t"),
        F.lit(1).alias("is_probe"),
        "l_orderkey",
        "l_linenumber",
        F.lit(None).cast("date").alias("idx_date"),
        F.lit(None).cast("double").alias("idx_val"),
    )
    w = (
        Window.partitionBy("prio")
        .orderBy("t", "is_probe")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = build_side.unionByName(probe_side).select(
        "prio",
        "t",
        "is_probe",
        "l_orderkey",
        "l_linenumber",
        F.last("idx_date", ignorenulls=True).over(w).alias("idx_date"),
        F.last("idx_val", ignorenulls=True).over(w).alias("idx_val"),
    )
    return (
        carried.filter((F.col("is_probe") == 1) & F.col("idx_val").isNotNull())
        .select(
            "l_orderkey",
            "l_linenumber",
            F.col("t").alias("sd"),
            "idx_date",
            "idx_val",
        )
    )


@query(
    "join_interval_events",
    oracle="""
SELECT c.event_id,
       COUNT(p.event_id) AS n_purchases_5m
FROM events c
LEFT JOIN events p
  ON p.user_id = c.user_id
 AND p.event_type = 'purchase'
 AND p.ts > c.ts
 AND p.ts <= c.ts + INTERVAL 5 MINUTE
WHERE c.event_type = 'click'
GROUP BY c.event_id
""",
)
def join_interval_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time interval join (batch form; the stream-stream variant
    with watermarks lives in streaming/joins.py): purchases within 5
    minutes after each click by the same user. The equi key (user_id)
    makes this a plain shuffled equi-join with the time bound applied as
    a post-join filter — no nested loop; the interval bound is also what
    lets the streaming version expire state."""
    ev = load(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("c_event_id"),
        F.col("user_id").alias("c_user_id"),
        F.col("ts").alias("c_ts"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_event_id"),
        F.col("user_id").alias("p_user_id"),
        F.col("ts").alias("p_ts"),
    )
    j = clicks.join(
        purchases,
        (F.col("p_user_id") == F.col("c_user_id"))
        & (F.col("p_ts") > F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 5 MINUTES")),
        "left",
    )
    return j.groupBy(F.col("c_event_id").alias("event_id")).agg(
        F.count("p_event_id").alias("n_purchases_5m")
    )
