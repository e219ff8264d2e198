"""Driver-environment robustness: queries must produce oracle-correct
results even when the provided SparkSession starts with hostile conf —
a non-UTC timezone and ANSI mode on — because `ensure_runtime_conf`
(applied by every __spark_entry__ wrapper) owns the determinism-critical
settings."""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entrymod
from agri_market_data_pipeline_spark.schemas import TABLE_NAMES
from agri_market_data_pipeline_spark.tables import table_path

PROBES = [
    "fn_date",
    "stream_tumbling_agg",
    "sink_delta_upsert",
    "scan_jsonl",
    # ts→DATE casts are session-timezone-sensitive: these prove the
    # wrapper's UTC pin holds for the cohort/streak day arithmetic
    "win_retention_cohort",
    "win_streak",
    "stream_python_datasource",
    # r6 additions: conv()/modulo hash-lattice arithmetic and the
    # HLL tolerance contract must hold under ANSI mode too
    "agg_join_size_sketch",
    "dq_k_anonymity",
    "agg_hll_merge",
    # trig + md5-lattice coordinates and the ln score lattice must be
    # timezone/ANSI-insensitive too
    "fn_geo_haversine",
    "ml_naive_bayes",
]


@pytest.mark.parametrize("name", PROBES)
def test_queries_survive_hostile_conf(spark, sf_dir, name):
    old_tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "Asia/Kolkata")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        q = entrymod.queries()[name]
        sdf = q(spark, sf_dir)
        scols = sorted(sdf.columns)
        srows = sorted(
            tuple(str(r[c]) for c in scols) for r in sdf.collect()
        )
        oracle = entrymod.oracle_sql()[name]
        con = duckdb.connect()
        for t in TABLE_NAMES:
            con.sql(
                f"CREATE VIEW {t} AS SELECT * FROM '{table_path(sf_dir, t)}'"
            )
        rel = con.sql(oracle)
        ocols = sorted(rel.columns)
        orows = sorted(
            tuple(str(v) for v in (dict(zip(rel.columns, row))[c] for c in ocols))
            for row in rel.fetchall()
        )
        assert scols == ocols
        assert srows == orows, f"{name}: first diff {next((a, b) for a, b in zip(srows, orows) if a != b)}"
    finally:
        spark.conf.set("spark.sql.session.timeZone", old_tz)
