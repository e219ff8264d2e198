"""Skew-handling operators (SURVEY.md §4.2: Kerala ≈ 20% of rows,
Variety='Other' ≈ 54% — real skew keys in the reference's data).

Two mechanisms, both demonstrated on the most skewed join the testdata
offers (lineitem.l_suppkey has only |supplier| distinct values — at
sf0.1 that is 600k rows over 100 suppliers):

- AQE skew-join splitting (spark.sql.adaptive.skewJoin.*, on by default
  in session.py) — the zero-code path;
- explicit salting (`join_skew_salted`) — the portable pattern for when
  the engine must guarantee bounded partition sizes (e.g. the 54%
  'Other' key, which AQE can split for joins but not for single-key
  aggregation states): replicate the small side SALT ways, scatter the
  fact side deterministically, join on (key, salt), then roll up.

The salted result is hash-verified equal to the plain join — the
technique is proven semantics-preserving, not just described.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.exact import dsum, sql_dsum
from ..registry import query
from ..tables import load

_SALT = 16
_BAND_W = 1000  # acctbal band width == the range predicate's radius


@query(
    "join_range_banded",
    oracle="""
SELECT s.s_suppkey,
       COUNT(*) AS n_cust_in_band
FROM supplier s
JOIN customer c
  ON c.c_acctbal BETWEEN s.s_acctbal - 1000 AND s.s_acctbal + 1000
GROUP BY s.s_suppkey
""",
)
def join_range_banded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scale path for join_range_theta, implemented and proven:
    band-bucket both sides at the predicate radius (width = 1000), fan
    the probe side out to its own and both neighbor bands, equi-join on
    the band id, then re-apply the exact range predicate. Every
    candidate pair falls in some shared band (|a−b| ≤ W ⇒ bands differ
    by ≤ 1), so the rewrite is lossless — and the oracle is the plain
    theta join, hash-proving it. O(n·m) nested-loop becomes a
    co-partitioned equi-join with ≤3× probe fan-out; at 100 TB both
    sides shuffle once on the band id and AQE handles band skew."""
    s = load(spark, sf_dir, "supplier")
    c = load(spark, sf_dir, "customer")
    s_banded = s.withColumn(
        "band", F.floor(F.col("s_acctbal") / _BAND_W).cast("long")
    )
    c_banded = c.withColumn(
        "band0", F.floor(F.col("c_acctbal") / _BAND_W).cast("long")
    ).withColumn("band", F.explode(F.expr("array(band0 - 1, band0, band0 + 1)")))
    exact = F.col("c_acctbal").between(
        F.col("s_acctbal") - _BAND_W, F.col("s_acctbal") + _BAND_W
    )
    return (
        s_banded.join(c_banded, "band")
        .filter(exact)
        .groupBy("s_suppkey")
        .agg(F.count("*").alias("n_cust_in_band"))
    )


@query(
    "join_skew_salted",
    oracle=f"""
SELECT s.s_name,
       COUNT(*) AS n_lines,
       {sql_dsum("l.l_extendedprice")} AS sum_price
FROM lineitem l
JOIN supplier s ON l.l_suppkey = s.s_suppkey
GROUP BY s.s_name
""",
)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted equi-join + rollup over a pathologically skewed key.

    The fact side gets salt = l_orderkey % {_SALT} (deterministic — a
    hash/rand salt works too, but this keeps the query replayable); the
    supplier side is replicated across all {_SALT} salt values via a
    tiny generated array + explode. The join key becomes (suppkey,
    salt): each formerly-hot key now spreads over {_SALT} partitions,
    bounding every shuffle partition at ~1/{_SALT} of the hot key. The
    final groupBy re-aggregates across salts (partial aggs make this
    cheap). The oracle is the UNSALTED join — proving the rewrite exact.
    """
    li = load(spark, sf_dir, "lineitem").withColumn(
        "salt", (F.col("l_orderkey") % _SALT).cast("int")
    )
    s = load(spark, sf_dir, "supplier").withColumn(
        "salt", F.explode(F.array(*[F.lit(i) for i in range(_SALT)]))
    )
    return (
        li.join(s, (li.l_suppkey == s.s_suppkey) & (li.salt == s.salt))
        .groupBy("s_name")
        .agg(F.count("*").alias("n_lines"), dsum("l_extendedprice").alias("sum_price"))
    )
