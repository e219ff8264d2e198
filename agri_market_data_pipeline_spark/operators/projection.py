"""Projection / filter / predicate operators (SURVEY.md §2.B).

project_select, filter_pred, filter_quality — the declarative core.
filter_quality reproduces the reference's residual-dirt check
(Min_Price > Max_Price rows exist in data/crops/apple.csv; SURVEY.md
§1.3.5) on the testdata analog (l_discount vs l_tax)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load


@query(
    "project_select",
    oracle="""
SELECT o_orderkey,
       UPPER(o_orderstatus) AS status,
       o_totalprice * 0.9 AS discounted_price,
       CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS order_year
FROM orders
""",
)
def project_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column pruning + renames + computed columns. ReadSchema ends up
    with exactly the 4 referenced source columns."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.upper("o_orderstatus").alias("status"),
        (F.col("o_totalprice") * 0.9).alias("discounted_price"),
        F.year("o_orderdate").cast("int").alias("order_year"),
    )


@query(
    "filter_pred",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
WHERE o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1998-12-31'
  AND o_orderpriority IN ('1-URGENT', '2-HIGH')
  AND (o_totalprice > 150000 OR o_orderstatus = 'F')
  AND o_orderpriority LIKE '%G%'
""",
)
def filter_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive + disjunctive predicates, BETWEEN on dates, IN-list,
    LIKE — all pushable/codegen'd; the date range and IN-list reach the
    parquet reader as PushedFilters."""
    o = load(spark, sf_dir, "orders")
    return o.filter(
        F.col("o_orderdate").between(
            F.lit("1996-01-01").cast("timestamp"),
            F.lit("1998-12-31").cast("timestamp"),
        )
        & F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        & ((F.col("o_totalprice") > 150000) | (F.col("o_orderstatus") == "F"))
        # '%G%' matches both '1-URGENT' and '2-HIGH' — a pattern that
        # dead-ends one IN-list member would make half the IN coverage vacuous
        & F.col("o_orderpriority").like("%G%")
    ).select("o_orderkey", "o_custkey", "o_totalprice")


@query(
    "filter_quality",
    oracle="""
SELECT CASE WHEN l_discount > l_tax THEN 'anomaly' ELSE 'ok' END AS quality,
       COUNT(*) AS cnt
FROM lineitem
GROUP BY 1
""",
)
def filter_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality flagging: the engine-side analog of detecting the
    reference's `Min_Price > Max_Price` rows (SURVEY.md §1.3.5) — a
    `when/otherwise` flag followed by an aggregate, so bad rows are
    routed/reported rather than silently kept."""
    li = load(spark, sf_dir, "lineitem")
    flag = F.when(F.col("l_discount") > F.col("l_tax"), F.lit("anomaly")).otherwise(
        F.lit("ok")
    )
    return (
        li.select(flag.alias("quality"))
        .groupBy("quality")
        .agg(F.count("*").alias("cnt"))
    )


@query(
    "obs_observe_metrics",
    oracle="""
SELECT 'rows_in' AS metric, CAST(COUNT(*) AS BIGINT) AS value
FROM lineitem
UNION ALL
SELECT 'rows_kept', CAST(SUM(CASE WHEN l_quantity >= 25 THEN 1 ELSE 0 END)
                         AS BIGINT)
FROM lineitem
UNION ALL
SELECT 'qty_kept_sum',
       CAST(COALESCE(SUM(CASE WHEN l_quantity >= 25
                     THEN CAST(floor(l_quantity) AS BIGINT) END), 0)
            AS BIGINT)
FROM lineitem
""",
)
def obs_observe_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pipeline observability via Spark's Observation API
    (`df.observe`): named accumulator-style metrics (rows in, rows
    surviving the filter, kept quantity) collected AS A BYPRODUCT of
    running the pipeline — zero extra scans, the metrics ride the
    action's execution. This is how a production job reports its own
    row-count reconciliation (the audit a warehouse load publishes
    with each run); the oracle recomputes the same metrics
    relationally, proving the observed values are exact, not sampled.

    Scale note: observe() metrics are merged on the driver from
    per-task updates like any accumulator — constant driver cost, no
    extra shuffle; the observed frame here is drained through the
    noop sink (distributed, no collect of data rows)."""
    from pyspark.sql import Observation

    li = load(spark, sf_dir, "lineitem")
    obs_in = Observation("in")
    obs_kept = Observation("kept")
    staged = (
        li.observe(obs_in, F.count(F.lit(1)).alias("rows_in"))
        .filter(F.col("l_quantity") >= 25)
        .observe(
            obs_kept,
            F.count(F.lit(1)).alias("rows_kept"),
            F.sum(F.floor("l_quantity").cast("long")).alias("qty_kept_sum"),
        )
    )
    # one action drives the pipeline and populates both observations
    staged.write.format("noop").mode("overwrite").save()
    # SUM over zero surviving rows observes as None (SQL NULL) — report
    # 0, mirrored by the oracle's COALESCE (degencheck: every
    # degenerate-lineitem quantity is below the filter)
    qty = obs_kept.get["qty_kept_sum"]
    rows = [
        ("rows_in", int(obs_in.get["rows_in"])),
        ("rows_kept", int(obs_kept.get["rows_kept"])),
        ("qty_kept_sum", 0 if qty is None else int(qty)),
    ]
    return spark.createDataFrame(rows, "metric string, value long")
