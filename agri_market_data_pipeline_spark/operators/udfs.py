"""UDF / UDAF / UDTF surface (SURVEY.md §2.B udf_scalar_pandas,
udaf_grouped, udtf_explode_like).

Policy: UDFs are the slow path — everything expressible with built-ins
uses built-ins. These operators exist to pin the *surface*: Arrow-batched
pandas UDFs (vectorized, ~10-100× row-at-a-time Python), applyInPandas
grouped aggregation, and generator (one-to-many) expansion.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

from ..registry import query
from ..tables import load, load_parallel


@query(
    "udf_scalar_pandas",
    oracle="""
SELECT l_orderkey, l_linenumber,
       round(ln(1 + (l_extendedprice * (1 - l_discount)) / 10000.0), 6)
           AS price_score
FROM lineitem
""",
)
def udf_scalar_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized scalar pandas UDF (Arrow batches, numpy inside).

    The score itself IS built-in-expressible — deliberately, so the
    oracle can verify the UDF machinery end-to-end. Real uses are the
    library-backed transforms (tokenizers, decoders) in extensions/."""
    import numpy as np

    @F.pandas_udf(DoubleType())
    def price_score(price: pd.Series, discount: pd.Series) -> pd.Series:
        net = price.to_numpy() * (1.0 - discount.to_numpy())
        return pd.Series(np.round(np.log1p(net / 10000.0), 6))

    li = load_parallel(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        price_score("l_extendedprice", "l_discount").alias("price_score"),
    )


@query(
    "udaf_grouped",
    oracle="""
SELECT l_returnflag, qty_mode, mode_count
FROM (
    SELECT l_returnflag, l_quantity AS qty_mode, COUNT(*) AS mode_count,
           ROW_NUMBER() OVER (PARTITION BY l_returnflag
                              ORDER BY COUNT(*) DESC, l_quantity ASC) AS rn
    FROM lineitem
    GROUP BY l_returnflag, l_quantity
) t
WHERE rn = 1
""",
)
def udaf_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom grouped aggregate via applyInPandas: the statistical MODE
    of quantity per return flag (most frequent value; ties → smallest
    value, making it deterministic). This is the 'modal price' of the
    reference's domain — Agmarknet's Modal_Price column is exactly a
    per-group mode the upstream computes.

    Scale note: applyInPandas materializes each group in one worker's
    memory — fine for bounded groups (per returnflag after pre-agg);
    for unbounded groups pre-reduce with a built-in count first (as the
    oracle formulation does) and keep the UDF for the tiny final step."""
    li = load(spark, sf_dir, "lineitem")
    # Pre-reduce JVM-side: (flag, qty) counts are tiny; the pandas step
    # then handles only ~|distinct qty| rows per group.
    counts = li.groupBy("l_returnflag", "l_quantity").agg(F.count("*").alias("cnt"))

    def pick_mode(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["cnt", "l_quantity"], ascending=[False, True])
        top = pdf.iloc[0]
        return pd.DataFrame(
            {
                "l_returnflag": [top["l_returnflag"]],
                "qty_mode": [float(top["l_quantity"])],
                "mode_count": [int(top["cnt"])],
            }
        )

    return counts.groupBy("l_returnflag").applyInPandas(
        pick_mode, "l_returnflag string, qty_mode double, mode_count bigint"
    )


_CHUNK = 20


@query(
    "udtf_python",
    oracle=f"""
WITH s AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
e AS (SELECT doc_id, toks,
             unnest(generate_series(0,
                 CAST(ceil(len(toks) / {_CHUNK}.0) AS BIGINT) - 1)) AS chunk_no
      FROM s)
SELECT doc_id,
       CAST(chunk_no AS INT) AS chunk_no,
       array_to_string(toks[chunk_no * {_CHUNK} + 1 : (chunk_no + 1) * {_CHUNK}], ' ')
           AS chunk_text,
       CAST(least(len(toks) - chunk_no * {_CHUNK}, {_CHUNK}) AS INT) AS n_tokens
FROM e
""",
)
def udtf_python(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A REAL Python UDTF (Spark 3.5+ table function): chunk each
    document into {_CHUNK}-token windows — the canonical pre-tokenizer
    document splitter of an LLM pipeline, where per-row one-to-many
    logic genuinely needs Python (a tokenizer library call sits where
    the split is). Registered and invoked through SQL LATERAL, so it
    composes with any relational query; each UDTF call handles one row,
    Arrow-batched."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_no int, chunk_text string, n_tokens int")
    class ChunkDoc:
        def eval(self, text: str):
            toks = text.split(" ")
            for i in range(0, len(toks), _CHUNK):
                piece = toks[i : i + _CHUNK]
                yield (i // _CHUNK, " ".join(piece), len(piece))

    spark.udtf.register("chunk_doc", ChunkDoc)
    load_parallel(spark, sf_dir, "documents").createOrReplaceTempView(
        "_udtf_docs"
    )
    return spark.sql(
        """
        SELECT d.doc_id, t.chunk_no, t.chunk_text, t.n_tokens
        FROM _udtf_docs d, LATERAL chunk_doc(d.text) t
        """
    )


@query(
    "udtf_explode_like",
    oracle="""
WITH s AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
e AS (SELECT doc_id, toks,
             unnest(generate_series(1, len(toks))) AS pos
      FROM s)
SELECT doc_id, CAST(pos AS INT) AS pos, toks[pos] AS tok
FROM e
""",
)
def udtf_explode_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-to-many generator: explode each document into (position,
    token) rows — posexplode over split, fully JVM-side. A Python UDTF
    (Spark 3.5+) covers the same surface when the expansion needs
    Python; for pure tokenization explode(split(...)) is strictly
    faster."""
    d = load_parallel(spark, sf_dir, "documents")
    return d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos0", "tok")
    ).select("doc_id", (F.col("pos0") + 1).cast("int").alias("pos"), "tok")


@query(
    "udf_scalar_arrow",
    oracle="""
SELECT l_orderkey, l_linenumber,
       CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
           AS net_cents
FROM lineitem
""",
)
def udf_scalar_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-OPTIMIZED Python UDF (`useArrow=True`, Spark 3.5+/4): the
    row-at-a-time `F.udf` signature with Arrow batch transfer under it
    — the migration path for legacy per-row UDFs that can't be
    rewritten to the pandas-Series signature but shouldn't pay pickle
    serialization. Complements udf_scalar_pandas (which pins the
    Series-vectorized form); the computation is again deliberately
    built-in-expressible so the oracle verifies the machinery. In the
    hot path both still lose to pure built-ins — registry policy
    stands: UDFs pin the surface, built-ins do the work."""
    @F.udf("long", useArrow=True)
    def net_cents(price: float, discount: float) -> int:
        import math

        return int(math.floor(price * (1.0 - discount) * 100))

    li = load_parallel(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        net_cents("l_extendedprice", "l_discount").alias("net_cents"),
    )


@query(
    "udf_cogroup_pandas",
    oracle="""
SELECT o.o_orderpriority AS prio,
       COUNT(DISTINCT o.o_orderkey) AS n_orders,
       COUNT(l.l_orderkey) AS n_lines
FROM orders o LEFT JOIN lineitem l ON o.o_orderkey = l.l_orderkey
GROUP BY 1
""",
)
def udf_cogroup_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cogrouped pandas transform — `groupBy(...).cogroup(...)` +
    `applyInPandas`: both tables are shuffled ONCE on the same key and
    each key's two pandas frames arrive together in one Python call,
    the escape hatch for per-key logic spanning two inputs that no join
    can express (custom reconciliation, per-key model scoring against
    a feature table). Here each call computes per-priority order/line
    counts — deliberately join-expressible so the oracle certifies the
    cogroup machinery: partials re-aggregate to exactly the LEFT JOIN
    twin, proving no key lost on either side (including orders with
    zero lineitems). At 100 TB the cost model is one co-partitioned
    shuffle of each side + Arrow transfer — same exchange layout a
    shuffle join would need anyway."""
    o = load_parallel(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("prio"), "o_orderkey"
    )
    li = load(spark, sf_dir, "lineitem").join(
        load(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    ).select(F.col("o_orderpriority").alias("prio"), "l_orderkey")

    def reconcile(key, odf: pd.DataFrame, ldf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "prio": [key[0]],
                "n_orders": [odf["o_orderkey"].nunique()],
                "n_lines": [len(ldf)],
            }
        )

    return (
        o.groupBy("prio")
        .cogroup(li.groupBy("prio"))
        .applyInPandas(reconcile, "prio string, n_orders long, n_lines long")
    )


@query(
    "udf_map_in_arrow",
    oracle="""
SELECT l_returnflag AS grp,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(FLOOR(l_extendedprice * 100) AS BIGINT)
                * (10000 - CAST(FLOOR(l_discount * 10000) AS BIGINT)))
            AS BIGINT) AS revenue_lat,
       CAST(SUM(CAST(FLOOR(l_extendedprice * 100) AS BIGINT)
                * (10000 - CAST(FLOOR(l_discount * 10000) AS BIGINT)))
            AS DOUBLE) / COUNT(*) AS avg_revenue_lat
FROM lineitem
GROUP BY l_returnflag
""",
)
def udf_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow — the ZERO-COPY member completing the Python UDF
    surface: the batch iterator yields raw `pyarrow.RecordBatch`es
    (no pandas materialization at all, unlike mapInPandas /
    applyInPandas), the right tool when the Python side is itself
    Arrow-native (pyarrow.compute, polars, DuckDB-in-process,
    Arrow-backed feature stores). Here each batch computes the
    discount-adjusted revenue on an exact integer lattice entirely in
    pyarrow.compute kernels — cents(price) × (10000 − bp(discount)) —
    and ships back only (grp, micro) columns; Spark then aggregates
    JVM-side (map-side partial sums), so Python touches each row once
    and no group state ever crosses the boundary.

    Determinism: FLOOR(x·100)/FLOOR(x·10000) lattice casts are the
    same IEEE ops in pyarrow and DuckDB; products and sums are exact
    BIGINTs (≈1e11/row — SUM overflows int64 past ~1e7 rows/group;
    ANSI fails loudly there, migrate to DECIMAL(38,0) then);
    avg_revenue_lat is an unrounded integer-ratio double.

    Scale: map-only (zero shuffle before the final partial agg);
    Arrow batches stream through the Python worker at
    maxRecordsPerBatch grain, memory bounded per task."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def adj_revenue(batches):
        for b in batches:
            price = pc.cast(b.column("l_extendedprice"), pa.float64())
            disc = pc.cast(b.column("l_discount"), pa.float64())
            cents = pc.cast(pc.floor(pc.multiply(price, 100.0)), pa.int64())
            bp = pc.cast(pc.floor(pc.multiply(disc, 10000.0)), pa.int64())
            micro = pc.multiply(cents, pc.subtract(10000, bp))
            yield pa.RecordBatch.from_arrays(
                [b.column("l_returnflag"), micro], ["grp", "micro"]
            )

    li = load_parallel(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice", "l_discount"
    )
    out = li.mapInArrow(adj_revenue, "grp string, micro long")
    return out.groupBy("grp").agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.sum("micro").cast("bigint").alias("revenue_lat"),
        (F.sum("micro").cast("double") / F.count("*")).alias(
            "avg_revenue_lat"
        ),
    )
