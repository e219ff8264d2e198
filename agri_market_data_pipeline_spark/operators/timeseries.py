"""Time-series operators: sessionization (gaps-and-islands) and
calendar densify + forward fill.

The reference models time series relationally (SURVEY.md §1.2: date
column + group keys, no dedicated structure), which is exactly Spark's
model — these two operators are the canonical relational time-series
transforms its data exists to serve:

- gaps-and-islands sessionization is the batch twin of
  `session_window` (streaming/ops.py): same semantics, expressible as
  two window passes, so it gets a full value-hash oracle where the
  streaming variant can only be rows-checked;
- densify + forward-fill is the agmarknet "price on days with no
  quotation" query (markets don't trade daily — SURVEY.md §1.1 grain),
  built from the same carry-forward primitive as the as-of join
  (operators/asof.py) but materializing the full calendar.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load, load_parallel

_GAP_US = 30 * 60 * 1_000_000  # 30-minute session gap, microseconds


@query(
    "win_sessionize",
    oracle=f"""
WITH x AS (
  SELECT user_id, event_id, epoch_us(ts) AS tus,
         LAG(epoch_us(ts)) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS prev
  FROM events
), s AS (
  SELECT user_id, event_id, tus,
         CAST(SUM(CASE WHEN prev IS NULL OR tus - prev > {_GAP_US}
                       THEN 1 ELSE 0 END)
              OVER (PARTITION BY user_id ORDER BY tus, event_id
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
  FROM x
)
SELECT user_id, session_id,
       COUNT(*) AS n_events,
       MIN(tus) AS t0_us,
       MAX(tus) AS t1_us
FROM s
GROUP BY user_id, session_id
""",
)
def win_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization by the gaps-and-islands pattern: a new
    session starts where the gap to the previous event exceeds 30 min;
    the running sum of session starts is the session id.

    Both window passes and the final aggregation hash-partition by
    user_id, so the whole operator is ONE shuffle reused across three
    stages. Gap arithmetic is in integral microseconds (`unix_micros` ↔
    DuckDB `epoch_us`): epoch µs exceed double's 53-bit mantissa, float
    seconds would mis-order near-tie gaps. event_id is the unique
    tiebreaker (registry.py window rule). At 100 TB per-user history is
    bounded, so no per-key skew; the streaming twin is
    `stream_session_window`.
    """
    ev = load(spark, sf_dir, "events")
    tus = F.unix_micros("ts")
    w = Window.partitionBy("user_id").orderBy("tus", "event_id")
    base = ev.select("user_id", "event_id", tus.alias("tus"))
    prev = F.lag("tus").over(w)
    # prev IS NULL opens the user's first session explicitly — a bare
    # `tus - prev > gap` is NULL there and would fall through to 0
    new_sess = F.when(
        prev.isNull() | (F.col("tus") - prev > _GAP_US), 1
    ).otherwise(0)
    sess = base.withColumn(
        "session_id",
        F.sum(new_sess)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long"),
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.min("tus").alias("t0_us"),
        F.max("tus").alias("t1_us"),
    )


@query(
    "ts_gap_fill",
    oracle="""
WITH agg AS (
  SELECT o_orderpriority AS prio, CAST(o_orderdate AS DATE) AS d,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE) AS v
  FROM orders
  WHERE o_totalprice > 400000
  GROUP BY 1, 2
), rng AS (
  SELECT prio, MIN(d) AS d0, MAX(d) AS d1 FROM agg GROUP BY prio
), cal AS (
  SELECT prio, CAST(UNNEST(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS d
  FROM rng
), j AS (
  SELECT cal.prio, cal.d, agg.v
  FROM cal LEFT JOIN agg ON agg.prio = cal.prio AND agg.d = cal.d
)
SELECT prio, d,
       LAST_VALUE(v IGNORE NULLS)
         OVER (PARTITION BY prio ORDER BY d ROWS UNBOUNDED PRECEDING)
         AS v_filled
FROM j
""",
)
def ts_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Densify a sparse daily series to the full calendar and carry the
    last observation forward (the "price between quotation days" query;
    the >400k filter makes the series genuinely sparse so the fill is
    exercised).

    The calendar is generated from the per-group [min, max] range —
    `sequence()` + `explode` on a #groups-sized frame, negligible next
    to the fact scan — then one left join and one carry-forward window,
    both hash-partitioned by group key: two shuffles total, each sized
    by #groups × #days, independent of fact-table width. `d` is unique
    per group after the daily pre-aggregation, so the window order needs
    no extra tiebreaker.
    """
    o = load_parallel(spark, sf_dir, "orders")
    agg = (
        o.filter(F.col("o_totalprice") > 400000)
        .groupBy(
            F.col("o_orderpriority").alias("prio"),
            F.col("o_orderdate").cast("date").alias("d"),
        )
        .agg(F.sum(F.col("o_totalprice").cast("decimal(30,6)")).cast("double").alias("v"))
    )
    rng = agg.groupBy("prio").agg(F.min("d").alias("d0"), F.max("d").alias("d1"))
    cal = rng.select("prio", F.explode(F.sequence("d0", "d1")).alias("d"))
    j = cal.join(agg, ["prio", "d"], "left")
    w = (
        Window.partitionBy("prio")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return j.select(
        "prio",
        "d",
        F.last("v", ignorenulls=True).over(w).alias("v_filled"),
    )
