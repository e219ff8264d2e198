"""Planted-skew measurement for the join_skew_salted story (SCALE.md).

Plants a pathological key distribution — ONE supplier owning half the
fact rows — and measures the same aggregate join three ways:

  plain   shuffle hash/sort-merge join, AQE skew handling OFF
          (what a naive plan does: the hot key's entire row set lands
          in one shuffle partition / one task)
  aqe     AQE skew-join splitting ON (Spark's zero-code mitigation)
  salted  join_skew_salted's explicit (key, salt) rewrite — the
          pattern that also covers what AQE can't (single-key
          aggregation state, already-aggregated build sides)

Prints one markdown table row per variant: wall seconds (median of 3),
plus a hash-equality check of salted vs plain results. Run:

    python tools/skewbench.py [n_rows] [skew_frac]

A second mode measures the DEGREE-CAP guard on the blocked pair
self-join (the pattern behind graph_bipartite_projection,
agg_market_basket, multimodal_phash_pairs): plant one hub key whose
degree makes the per-key quadratic term dominate, and time the capped
vs uncapped join. Run:

    python tools/skewbench.py hub [n_normal_keys] [hub_degree]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from agri_market_data_pipeline_spark.functions.exact import dsum  # noqa: E402
from agri_market_data_pipeline_spark.session import get_spark  # noqa: E402

_SALT = 16


def main() -> int:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    skew_frac = float(sys.argv[2]) if len(sys.argv) > 2 else 0.5
    n_keys = 100

    spark = get_spark("skewbench")
    spark.sparkContext.setLogLevel("ERROR")

    # Planted skew: key 0 owns skew_frac of all rows; the rest uniform.
    cut = int(n_rows * skew_frac)
    fact = (
        spark.range(n_rows, numPartitions=32)
        .select(
            F.when(F.col("id") < cut, F.lit(0))
            .otherwise((F.col("id") % (n_keys - 1)) + 1)
            .cast("long")
            .alias("k"),
            (F.col("id") % 1000).cast("double").alias("v"),
            F.col("id").alias("rid"),
        )
        .localCheckpoint(eager=True)  # freeze the input out of the timing
    )
    dim = (
        spark.range(n_keys)
        .select(F.col("id").alias("k"), F.concat(F.lit("key-"), F.col("id")).alias("name"))
        .localCheckpoint(eager=True)
    )

    def plain():
        return (
            fact.join(dim.hint("shuffle_hash"), "k")
            .groupBy("name")
            .agg(F.count("*").alias("n"), dsum("v").alias("sv"))
        )

    def salted():
        f = fact.withColumn("salt", (F.col("rid") % _SALT).cast("int"))
        d = dim.withColumn(
            "salt", F.explode(F.array(*[F.lit(i) for i in range(_SALT)]))
        )
        return (
            f.join(d.hint("shuffle_hash"), ["k", "salt"])
            .groupBy("name")
            .agg(F.count("*").alias("n"), dsum("v").alias("sv"))
        )

    def timed(mk, aqe_skew: bool, aqe: bool = True) -> float:
        confs = {
            "spark.sql.adaptive.enabled": str(aqe).lower(),
            "spark.sql.adaptive.skewJoin.enabled": str(aqe_skew).lower(),
            # keep the dim side out of broadcast so the shuffle join
            # (the skew-sensitive plan) is what actually runs
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        }
        old = {k: spark.conf.get(k, None) for k in confs}
        try:
            for k, v in confs.items():
                spark.conf.set(k, v)
            mk().write.format("noop").mode("overwrite").save()  # warm
            ts = []
            for _ in range(3):
                t0 = time.time()
                mk().write.format("noop").mode("overwrite").save()
                ts.append(time.time() - t0)
            return statistics.median(ts)
        finally:
            for k, v in old.items():
                if v is not None:
                    spark.conf.set(k, v)

    rows = [
        ("plain (AQE skew off)", timed(plain, aqe_skew=False, aqe=False)),
        ("AQE skew split", timed(plain, aqe_skew=True)),
        ("salted x16 (AQE off)", timed(salted, aqe_skew=False, aqe=False)),
    ]
    # correctness cross-check: salted == plain results
    a = plain().orderBy("name").collect()
    b = salted().orderBy("name").collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b], "salted != plain"

    print(f"planted skew: {n_rows:,} fact rows, key 0 owns {skew_frac:.0%}, "
          f"{n_keys} keys, local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
    print("| variant | median wall s |")
    print("|---------|--------------:|")
    for name, t in rows:
        print(f"| {name} | {t:.3f} |")
    print("salted result hash-equal to plain: yes")
    return 0


def hub_main() -> int:
    """Planted-hub degree-cap measurement: one key with `hub_degree`
    distinct values (C(d,2) candidate pairs), `n_normal` keys with 3
    each. Times the blocked pair self-join uncapped vs rank-capped at
    the bipartite generator's cap — the measured artifact behind the
    conditional cap decision (VERDICT r5 item 8)."""
    from pyspark.sql import Window

    from agri_market_data_pipeline_spark.operators.graph import (
        _BP_DEGREE_CAP,
    )

    n_normal = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
    hub_degree = int(sys.argv[3]) if len(sys.argv) > 3 else 6_000

    spark = get_spark("skewbench-hub")
    spark.sparkContext.setLogLevel("ERROR")

    hub = spark.range(hub_degree).select(
        F.lit(0).cast("long").alias("cust"), F.col("id").alias("part")
    )
    normal = spark.range(n_normal).select(
        (F.col("id") + 1).alias("cust"),
        F.explode(
            F.array(
                (F.col("id") % 97), (F.col("id") % 89 + 100), (F.col("id") % 83 + 200)
            )
        ).alias("part"),
    )
    cp = hub.union(normal).repartition(32).localCheckpoint(eager=True)

    def pairs(frame):
        a, b = frame.alias("a"), frame.alias("b")
        return (
            a.join(
                b,
                (F.col("a.cust") == F.col("b.cust"))
                & (F.col("a.part") < F.col("b.part")),
            )
            .groupBy(F.col("a.part").alias("pa"), F.col("b.part").alias("pb"))
            .agg(F.count("*").alias("w"))
        )

    def uncapped():
        return pairs(cp)

    def capped():
        w = Window.partitionBy("cust").orderBy("part")
        return pairs(
            cp.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= _BP_DEGREE_CAP)
            .drop("_rn")
        )

    def timed(mk) -> float:
        mk().write.format("noop").mode("overwrite").save()  # warm
        ts = []
        for _ in range(3):
            t0 = time.time()
            mk().write.format("noop").mode("overwrite").save()
            ts.append(time.time() - t0)
        return statistics.median(ts)

    t_un = timed(uncapped)
    t_cap = timed(capped)
    print(
        f"planted hub: 1 key x degree {hub_degree:,} "
        f"(C(d,2)={hub_degree * (hub_degree - 1) // 2:,} pairs) + "
        f"{n_normal:,} keys x degree 3; cap={_BP_DEGREE_CAP}"
    )
    print("| variant | median wall s |")
    print("|---------|--------------:|")
    print(f"| uncapped pair self-join | {t_un:.3f} |")
    print(f"| degree-capped (rank<=cap) | {t_cap:.3f} |")
    print(f"cap speedup at this hub: {t_un / t_cap:.2f}x")
    return 0


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "hub":
        raise SystemExit(hub_main())
    raise SystemExit(main())
